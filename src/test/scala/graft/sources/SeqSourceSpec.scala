package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The DSv2 source's pushdown contracts: range filters prune planned
  * partitions, column pruning reaches the reader, and the unfiltered
  * read is complete. */
class SeqSourceSpec extends SparkSpec {

  private def seq(n: Long, parts: Int) =
    spark.read.format("graft.sources.SeqSource")
      .option("n", n.toString).option("parts", parts.toString).load()

  test("range pushdown prunes planned partitions") {
    // row-returning reads (a bare count() is now answered by the
    // aggregate pushdown without planning the row scan at all —
    // covered by its own test below)
    SeqSource.lastPlannedPartitions = -1
    val n = seq(100000L, 8)
      .where(col("id") >= 20000L && col("id") < 60000L)
      .select(col("id")).collect().length.toLong
    assert(n == 40000L)
    // [20000, 60000) over 8×12500 chunks touches chunks 1..4 only
    assert(SeqSource.lastPlannedPartitions == 4,
      s"planned ${SeqSource.lastPlannedPartitions} partitions")
    SeqSource.lastPlannedPartitions = -1
    assert(seq(100000L, 8).where(col("id") === 7L)
      .select(col("id")).collect().length == 1)
    assert(SeqSource.lastPlannedPartitions == 1) // point lookup: 1 chunk
  }

  test("aggregate pushdown answers count/min/max without a row scan") {
    SeqSource.lastPlannedPartitions = -1
    val r = seq(100000L, 8)
      .where(col("id") >= 20000L && col("id") < 60000L)
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.min(col("id")).as("mn"),
        org.apache.spark.sql.functions.max(col("id")).as("mx"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((40000L, 20000L, 59999L)))
    // the row scan was never planned — the source answered from
    // closed-form range arithmetic
    assert(SeqSource.lastPlannedPartitions == -1,
      s"row scan planned ${SeqSource.lastPlannedPartitions} partitions")
    // grouped aggregates must NOT push (fall back to the row path)
    val g = seq(1000L, 4).groupBy(col("tag"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(g.size == 7 && g.values.sum == 1000L)
  }

  test("pushdown is visible in the scan and pruning reaches the reader") {
    val df = seq(1000L, 4).where(col("id") >= 100L).select(col("tag"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushed=[100..999]"), plan)
    assert(plan.contains("cols=id,tag") || plan.contains("cols=tag"),
      plan) // id may survive for the residual filter; sq must not
    assert(!plan.contains("cols=id,sq,tag"), plan)
  }

  test("the scan is columnar and spans the batch boundary exactly") {
    // n > one vector fill: values crossing the 4096 chunk edge must
    // be seamless, and the plan must show the columnar boundary
    val df = seq(10000L, 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      "expected a columnar scan boundary:\n" + plan)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 10000)
    assert(rows.map(_._1).sorted.toSeq == (0L until 10000L))
    rows.foreach { case (id, sq) => assert(sq == (id * id) % 97) }
  }

  test("reported statistics drive an unhinted broadcast join") {
    // a pushed-down slice reports its PRUNED row count/bytes, so the
    // planner broadcasts the small side with no user hint — the
    // stats seam a custom source needs for good join plans
    val big = seq(200000L, 8)
    val small = seq(200000L, 8).where(col("id") < 50L)
      .select(col("id"), col("sq").as("small_sq"))
    val joined = big.join(small, "id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "expected a stats-driven broadcast:\n" + plan)
    assert(joined.count() == 50L)
  }

  test("unfiltered read is the complete, exact sequence") {
    val rows = seq(500L, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length == 500)
    assert(rows.map(_._1).sorted.toSeq == (0L until 500L))
    rows.foreach { case (id, sq, tag) =>
      assert(sq == (id * id) % 97)
      assert(tag == (id % 7).toString)
    }
  }
  test("top-N pushdown shrinks the scan to one k-row chunk") {
    SeqSource.lastPlannedPartitions = -1
    val top = seq(100000L, 8)
      .where(col("id") >= 20000L && col("id") < 60000L)
      .orderBy(col("id").desc).limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(59999L, 59998L, 59997L, 59996L, 59995L), top)
    // the source saw the TopN: only the [59995, 59999] slice planned
    assert(SeqSource.lastPlannedPartitions == 1,
      s"planned ${SeqSource.lastPlannedPartitions} partitions")
    // bare LIMIT is fully absorbed too
    SeqSource.lastPlannedPartitions = -1
    val lim = seq(100000L, 8).where(col("id") >= 500L).limit(3)
      .collect().map(_.getLong(0)).toSeq
    assert(lim == Seq(500L, 501L, 502L), lim)
    assert(SeqSource.lastPlannedPartitions == 1)
  }
  test("runtime filtering prunes the probe side of a broadcast join") {
    // the DSv2 DPP analog: the broadcast build side's id values reach
    // SupportsRuntimeFiltering.filter BEFORE the probe side plans, so
    // the big scan shrinks to the keys' hull — one chunk, not eight
    val big = seq(200000L, 8)
    val small = seq(200000L, 8)
      .where(col("id") >= 150000L && col("id") < 150010L)
      .select(col("id"), col("sq").as("ssq"))
    SeqSource.lastPlannedPartitions = -1
    val joined = big.join(small, "id")
    assert(joined.count() == 10L)
    // the LAST planned scan is the runtime-filtered probe side
    assert(SeqSource.lastPlannedPartitions == 1,
      s"probe side planned ${SeqSource.lastPlannedPartitions} chunks")
  }
}
