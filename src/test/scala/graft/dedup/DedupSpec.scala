package graft.dedup

import graft.SparkSpec

/** Ground-truth checks for the probabilistic dedup operators: a
  * driver-side brute-force over the sf0.001 corpus (500 docs, 125k
  * pairs — fine at test scale) is the truth set; MinHash-LSH and
  * SimHash are measured against it. */
class DedupSpec extends SparkSpec {

  private lazy val docs: Map[Long, String] =
    spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def shingle(text: String, n: Int = 3): Set[String] = {
    val w = text.trim.split("\\s+")
    if (w.length < n) Set(w.mkString(" "))
    else (0 to w.length - n).map(i => w.slice(i, i + n).mkString(" ")).toSet
  }

  private lazy val truePairs: Set[(Long, Long)] = {
    val ids = docs.keys.toArray.sorted
    val sh = docs.map { case (k, v) => k -> shingle(v) }
    (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      a = sh(ids(i)); b = sh(ids(j))
      inter = (a & b).size
      if inter.toDouble / (a.size + b.size - inter) >= 0.8
    } yield (ids(i), ids(j))).toSet
  }

  test("minhash-lsh finds every true near-dup pair (J >= 0.8)") {
    val found = Dedup.minhashLshPairs(spark, sf()).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(truePairs.nonEmpty, "fixture should contain planted near-dups")
    assert((truePairs -- found).isEmpty,
      s"missed pairs: ${(truePairs -- found).take(5)}")
  }

  test("simhash pair set agrees with brute-force truth") {
    val found = Dedup.simhashPairs(spark, sf()).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert((truePairs -- found).isEmpty,
      s"missed: ${(truePairs -- found).take(5)}")
    assert((found -- truePairs).isEmpty,
      s"false positives: ${(found -- truePairs).take(5)}")
  }

  test("exact dedup groups: every group count is >= 1 and ids are minimal") {
    val rows = Dedup.exactGroups(spark, sf()).collect()
    assert(rows.map(_.getAs[Long]("n")).forall(_ >= 1))
    assert(rows.length == docs.size) // corpus has no exact dups
  }

  test("oversized bucket expands as hub-star, not silent drop") {
    import spark.implicits._
    // 12 identical docs + 2 distinct ones; with maxBucket=5 the
    // identical cluster exceeds the cap in every band
    val dir = java.nio.file.Files.createTempDirectory("star_docs").toString
    val docs = ((0L until 12L).map(i =>
      (i, "the same exact document text repeated for cluster members", "a")) ++
      Seq((20L, "an entirely different document about something else", "a"),
        (21L, "yet another unrelated piece of text entirely here now", "a")))
      .toDF("doc_id", "text", "source")
    docs.write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val pairs = Dedup.minhashLshPairs(spark, dir, maxBucket = 5).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")))
    // star: every cluster member pairs with the hub (min id 0) — no
    // document lost, linear pair count instead of 66
    assert(pairs.length == 11, pairs.toSeq.toString)
    assert(pairs.forall(_._1 == 0L))
    assert(pairs.map(_._2).sorted.toSeq == (1L to 11L))
  }

  test("minhash estimate tracks true jaccard within 0.15") {
    val est = Dedup.minhashLshPairs(spark, sf()).collect()
      .map(r => ((r.getAs[Long]("id1"), r.getAs[Long]("id2")),
        r.getAs[Double]("est_jaccard"))).toMap
    est.foreach { case ((a, b), e) =>
      val sa = shingle(docs(a)); val sb = shingle(docs(b))
      val inter = (sa & sb).size
      val truth = inter.toDouble / (sa.size + sb.size - inter)
      assert(math.abs(truth - e) <= 0.15, s"pair ($a,$b): est $e true $truth")
    }
  }
}
