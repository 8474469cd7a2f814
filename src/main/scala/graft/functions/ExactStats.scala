package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: exact (count, sum) over a 2-decimal double column via a
  * scala BigDecimal buffer — the `Aggregator` surface of the engine
  * (SURVEY §2.10: the reference needs none; this is the extension
  * point users would reach for). The buffer is associative and the
  * partial merge is exact, so results are deterministic at any
  * parallelism — same contract as [[graft.util.Exact.dsum]], expressed
  * as a reusable typed aggregator instead of a column recipe.
  *
  * Rounding matches SQL decimal casts: HALF_UP at scale 2, the same
  * rule Spark's and DuckDB's CAST(... AS DECIMAL(18,2)) apply.
  */
object ExactStats
    extends Aggregator[Double, (Long, BigDecimal), (Long, Double)] {

  override def zero: (Long, BigDecimal) = (0L, BigDecimal(0).setScale(2))

  override def reduce(b: (Long, BigDecimal), a: Double): (Long, BigDecimal) =
    (b._1 + 1L,
      b._2 + BigDecimal(a).setScale(2, BigDecimal.RoundingMode.HALF_UP))

  override def merge(x: (Long, BigDecimal),
                     y: (Long, BigDecimal)): (Long, BigDecimal) =
    (x._1 + y._1, x._2 + y._2)

  override def finish(b: (Long, BigDecimal)): (Long, Double) =
    (b._1, b._2.toDouble)

  override def bufferEncoder: Encoder[(Long, BigDecimal)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, BigDecimal)]()

  override def outputEncoder: Encoder[(Long, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
}
