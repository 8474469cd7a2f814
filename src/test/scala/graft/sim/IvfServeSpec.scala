package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The served IVF zone's contract: probe-all from the zone is
  * bit-identical to brute force (q53's gate contract, now proven
  * THROUGH the build/serve round trip), the zone scan is genuinely
  * partition-pruned, and a partial probe keeps usable recall. */
class IvfServeSpec extends SparkSpec {

  private lazy val zone: String = {
    val d = java.nio.file.Files
      .createTempDirectory("ivf_zone").toString
    IvfServe.build(spark, sf(), d)
    d
  }

  private def queries = graft.Tables.load(spark, sf(), "embeddings")
    .where(col("vec_id") < 10)
    .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

  test("probe-all from the zone is bit-identical to brute force") {
    val brute = Similarity.knnBrute(spark, sf(), k = 5).collect()
    val served = IvfServe.search(spark, zone, queries, k = 5,
      nProbe = Similarity.IvfCells).collect()
    assert(served.sameElements(brute))
  }

  test("the zone scan is partition-pruned to the probed cells") {
    val plan = IvfServe.search(spark, zone, queries, k = 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.matches(
      "(?s).*PartitionFilters: \\[[^\\]]*cell[^\\]]*\\].*"),
      "expected PartitionFilters on cell:\n" + plan)
  }

  test("partial probe keeps usable recall vs brute force") {
    val brute = Similarity.knnBrute(spark, sf(), k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val served = IvfServe.search(spark, zone, queries, k = 5, nProbe = 4)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val recall = (brute & served).size.toDouble / brute.size
    assert(recall >= 0.3, s"served recall $recall")
  }
}
