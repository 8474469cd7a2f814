package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Adversarial-shape stress: a power-law duplicate corpus (clone
  * cluster sizes ~ 2000/k — the head-heavy distribution mass
  * duplication actually produces, not the near-uniform testdata). The
  * witness that the capped-bucket expansion and the groupBy-min
  * contraction hold at skew: candidate volumes stay LINEAR in corpus
  * (q37 shape) / batch (q115 shape), and connected components labels
  * every cluster correctly with no window gather. Measured volumes for
  * this corpus are recorded in PLANS.md (§scale-stress). */
class DedupScaleSpec extends SparkSpec {

  // cluster k (k = 1..10): 2000/k identical clones with ids
  // k*10000 + i — contiguous ids make cluster membership checkable
  // and pmod-10 delta membership ~20% per cluster; 300 singletons
  // with fully distinct token streams
  private val clusterSizes: Map[Int, Int] =
    (1 to 10).map(k => k -> (2000 / k)).toMap
  private val totalClones = clusterSizes.values.sum // 5856
  private val singletons = 300

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files
      .createTempDirectory("powerlaw_docs").toString
    // per-cluster token streams are fully DISJOINT (every token embeds
    // k) — shared filler words would make the clusters true near-dups
    // of each other, which LSH then correctly (but unhelpfully for
    // this fixture) pairs across clusters
    val clones = clusterSizes.toSeq.flatMap { case (k, sz) =>
      val text = (0 until 12).map(j => s"c${k}t${j}q").mkString(" ")
      (0 until sz).map(i => (k * 10000L + i, text, "a"))
    }
    val uniques = (0 until singletons).map(i => (900000L + i,
      (0 until 8).map(j => s"zq${i}x${j}w").mkString(" "), "a"))
    (clones ++ uniques).toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def cluster(id: Long): Long = id / 10000L

  test("q37 shape: candidate volume linear in corpus under power-law skew") {
    val pairs = Dedup.minhashLshPairs(spark, dir, maxBucket = 100)
      .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")))
    // star+chain per capped bucket: ≤ 2 pairs per member, NOT the
    // ~2M pairs full expansion of the 2000-clone head cluster alone
    assert(pairs.length <= 2 * totalClones,
      s"pair volume ${pairs.length} superlinear (docs=$totalClones)")
    // precision at skew: no cross-cluster or singleton pair
    assert(pairs.forall { case (a, b) =>
      cluster(a) == cluster(b) && a < 900000L })
    // recall at skew: every cluster remains ONE connected component
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    for ((k, sz) <- clusterSizes) {
      val roots = (0 until sz).map(i => find(k * 10000L + i)).toSet
      assert(roots.size == 1, s"cluster $k split into ${roots.size}")
    }
  }

  test("q115 shape: delta pairs track the batch, never intra-corpus") {
    val cap = 20
    val dp = Dedup.minhashDeltaPairs(spark, dir, maxBucket = cap)
      .select(col("corpus_id"), col("delta_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deltaClones = clusterSizes.toSeq.map { case (k, sz) =>
      (0 until sz).count(i => Math.floorMod(k * 10000L + i, 10L) >= 8L)
    }.sum
    // only corpus × delta — the intra-corpus quadratic bulk is never
    // generated, so per-batch cost tracks the delta even when the
    // corpus side of the bucket is a 2000-clone head cluster
    assert(dp.nonEmpty)
    assert(dp.forall { case (c, d) =>
      Math.floorMod(c, 10L) < 8L && Math.floorMod(d, 10L) >= 8L })
    assert(dp.length <= cap * deltaClones,
      s"${dp.length} pairs for $deltaClones delta docs exceeds the " +
        s"capped O(maxBucket x delta) bound")
    // within-cluster only
    assert(dp.forall { case (c, d) => cluster(c) == cluster(d) })
  }

  test("connected components labels the power-law clusters at scale") {
    import spark.implicits._
    val pairs = Dedup.minhashLshPairs(spark, dir, maxBucket = 100)
      .select(col("id1").as("a"), col("id2").as("b"))
    val labels = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == totalClones)
    for ((k, sz) <- clusterSizes; i <- Seq(0, sz - 1))
      assert(labels(k * 10000L + i) == k * 10000L,
        s"cluster $k not rooted at its min id")
  }
}
