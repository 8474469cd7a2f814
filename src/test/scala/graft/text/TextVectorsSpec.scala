package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Text-vector bridge contracts: mass conservation of the hashed-TF
  * relation, the pair report's threshold/order invariants, and the
  * must-catch case — exact clone documents score cosine 1. */
class TextVectorsSpec extends SparkSpec {

  test("q191 conserves token mass per document") {
    val tfMass = TextVectors.hashedTf(spark, sf())
      .groupBy(col("doc_id")).agg(sum(col("v")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tokens = graft.Tables.load(spark, sf(), "documents")
      .select(col("doc_id"),
        size(graft.util.Tokens.whitespace(col("text"))).cast("long")
          .as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    tfMass.foreach { case (id, m) =>
      assert(m == tokens(id), s"mass drifted at $id: $m vs ${tokens(id)}")
    }
    // docs absent from tf are exactly the token-less ones
    assert((tokens.keySet -- tfMass.keySet)
      .forall(id => tokens(id) <= 0))
  }

  test("q192 pairs respect threshold/order and catch exact clones") {
    // sf0.01: the smallest scale whose corpus carries EXACT clone
    // families (sf0.001 has only near-dups)
    val dir = sf("0.01")
    val pairs = TextVectors.tfCosinePairs(spark, dir).collect()
    pairs.foreach { r =>
      assert(r.getAs[Long]("id1") < r.getAs[Long]("id2"))
      assert(r.getAs[Double]("cosine") >= TextVectors.Tau)
    }
    val pairSet = pairs.map(r =>
      (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    // the near-dup families must surface (this corpus has no
    // byte-identical texts — its clones are high-overlap rewrites)
    assert(pairs.nonEmpty, "no near-dup pair found at sf0.01")
    // validate the top-scoring pair against its raw texts: the
    // reported cosine IS the token-count cosine, recomputed here
    // independently of the engine
    val top = pairs.maxBy(_.getAs[Double]("cosine"))
    val (a, b) = (top.getAs[Long]("id1"), top.getAs[Long]("id2"))
    val texts = graft.Tables.load(spark, dir, "documents")
      .where(col("doc_id").isin(a, b))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def counts(t: String): Map[Long, Long] =
      t.trim.split("[ \\t\\n\\x0B\\f\\r]+").toSeq
        .map(tok => graft.functions.Md5Prefix60.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(tok))
          % TextVectors.Dim)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (ca, cb) = (counts(texts(a)), counts(texts(b)))
    val dot = ca.map { case (d, v) => v * cb.getOrElse(d, 0L) }.sum
    val ref = dot.toDouble / math.sqrt(
      (ca.values.map(v => v * v).sum * cb.values.map(v => v * v).sum)
        .toDouble)
    assert(math.abs(ref - top.getAs[Double]("cosine")) < 1e-12,
      s"reported cosine drifted from reference: $ref vs $top")
    assert(ref >= 0.99, s"top pair unexpectedly weak: $ref")
  }
}
