package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q157 contracts (the oracle gate checks cross-engine equality of
  * every bit; these check the PROPERTIES the bloom design promises). */
class BlocklistSpec extends SparkSpec {

  private lazy val out = Blocklist.bloomScrub(spark, sf()).collect()

  test("q157: no false negatives — every blocked doc is a bloom hit") {
    // `caught` is the witness column; it must be TRUE everywhere, and
    // concretely: every true member hits
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("caught"), r.toString)
      if (r.getAs[Boolean]("true_member"))
        assert(r.getAs[Boolean]("bloom_hit"), r.toString)
      assert(r.getAs[Boolean]("keep") == !r.getAs[Boolean]("bloom_hit"))
    }
    // the deterministic stand-in blocklist: every 17th doc id is a
    // member (plus any doc sharing a blocked text digest)
    out.filter(_.getAs[Long]("doc_id") % 17 == 0)
      .foreach(r => assert(r.getAs[Boolean]("true_member"), r.toString))
  }

  test("q157: false-positive rate is a dial, not a failure mode") {
    // ~6% of docs set 3 of 4096 bits each; at sf0.001 occupancy is low
    // and the FP rate must stay far from saturation (a regression to
    // all-hits would still pass the no-false-negative contract — this
    // bounds the other side)
    val fp = out.count(r =>
      r.getAs[Boolean]("bloom_hit") && !r.getAs[Boolean]("true_member"))
    assert(fp.toDouble / out.length < 0.25,
      s"fp rate ${fp.toDouble / out.length} — filter saturated?")
  }
}
