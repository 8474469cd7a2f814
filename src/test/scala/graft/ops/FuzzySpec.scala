package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ground truth for the deletion-neighborhood fuzzy join. */
class FuzzySpec extends SparkSpec {

  /** Reference levenshtein (classic DP) for the exhaustive proofs. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** All strings of length ≤ n over the alphabet. */
  private def space(alpha: String, n: Int): Seq[String] =
    (0 to n).flatMap { len =>
      (0 until math.pow(alpha.length, len).toInt).map { x =>
        var (v, s) = (x, "")
        (0 until len).foreach { _ =>
          s += alpha(v % alpha.length); v /= alpha.length
        }
        s
      }
    }

  test("blocking is complete: every ed<=tau pair shares a delete key " +
    "(exhaustive over all strings of length <=4 on a 2-letter alphabet)") {
    import spark.implicits._
    val strs = space("ab", 4)
    for (tau <- Seq(1, 2)) {
      val keysOf = strs.toDF("name")
        .select(col("name"), expr(Fuzzy.delKeysExpr("name", tau)).as("ks"))
        .collect().map(r => r.getString(0) ->
          r.getSeq[String](1).toSet).toMap
      for (a <- strs; b <- strs if a < b && lev(a, b) <= tau)
        assert(keysOf(a).intersect(keysOf(b)).nonEmpty,
          s"tau=$tau: pair ($a, $b) at distance ${lev(a, b)} " +
            "shares no deletion key — blocking is lossy")
    }
  }

  test("join output equals brute force, including duplicate-name " +
    "expansion at distance 0") {
    import spark.implicits._
    val rel = Seq(
      (1L, "spark"), (2L, "spork"), (3L, "spark"), // dup name, ed-1 pair
      (4L, "shark"), (5L, "flink"), (6L, "flinc"),
      (7L, "spar"), (8L, "xspark"),                // delete / insert
      (9L, null.asInstanceOf[String])              // null never matches
    ).toDF("id", "name")
    val got = Fuzzy.editDistanceJoin(spark, rel, "id", "name", 1)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)]
      .collect().toSet
    val rows = rel.where(col("name").isNotNull)
      .as[(Long, String)].collect()
    val want = (for {
      (ia, na) <- rows; (ib, nb) <- rows
      if ia < ib && lev(na, nb) <= 1
    } yield (ia, ib, lev(na, nb).toLong)).toSet
    assert(got == want, s"got $got\nwant $want")
    // the planted exact-dup pair surfaces at distance 0
    assert(got.contains((1L, 3L, 0L)))
  }

  test("tau=2 catches transposition-shaped double edits tau=1 misses") {
    import spark.implicits._
    val rel = Seq((1L, "cluster"), (2L, "culster")).toDF("id", "name")
    assert(Fuzzy.editDistanceJoin(spark, rel, "id", "name", 1).count() == 0)
    val two = Fuzzy.editDistanceJoin(spark, rel, "id", "name", 2)
      .select("dist").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSeq
    assert(two == Seq(2L))
  }

  test("delta join: batch×corpus pairs only, oriented, brute-force equal") {
    import spark.implicits._
    val corpus = Seq((1L, "spark"), (2L, "flink"), (3L, "sprk"))
      .toDF("id", "name")
    val batch = Seq((10L, "spark"), (11L, "flunk"), (12L, "presto"))
      .toDF("id", "name")
    val got = Fuzzy.deltaEditDistanceJoin(spark, corpus, batch,
        "id", "name", 1)
      .select("batch_key", "corpus_key", "dist")
      .as[(Long, Long, Long)].collect().toSet
    // brute truth: (10,1,0 exact across boundary) (10,3,1) (11,2,1)
    assert(got == Set((10L, 1L, 0L), (10L, 3L, 1L), (11L, 2L, 1L)))
    // no intra-batch or intra-corpus pair can appear
    assert(got.forall { case (b, c, _) => b >= 10 && c < 10 })
  }

  test("q201 clusters: closure of brute-force pairs, canonical = min id") {
    import spark.implicits._
    val rows = Fuzzy.fuzzyClusters(spark, sf()).collect()
    val parts = graft.Tables.load(spark, sf(), "part")
      .select(col("p_partkey").cast("long"), col("p_name"))
      .as[(Long, String)].collect()
    // independent union-find over brute-force lev<=1 pairs
    val parent = scala.collection.mutable.Map(parts.map(p => p._1 -> p._1): _*)
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r); r
    }
    for ((ia, na) <- parts; (ib, nb) <- parts if ia < ib && lev(na, nb) <= 1) {
      val (ra, rb) = (find(ia), find(ib))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parts.map(p => p._1 -> find(p._1)).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("p_partkey")
      assert(r.getAs[Long]("entity_id") == want(id),
        s"entity drift at $id")
      assert(r.getAs[Boolean]("canonical") == (want(id) == id))
    }
    // real structure at spec SF: fewer entities than parts
    assert(want.values.toSet.size < parts.length)
  }

  test("q196 matches engine-side brute force on the sf0.001 customers") {
    import spark.implicits._
    val cust = graft.Tables.load(spark, sf(), "customer")
      .select(col("c_custkey").cast("long"), col("c_name"))
      .as[(Long, String)].collect()
    val want = (for {
      (ia, na) <- cust; (ib, nb) <- cust
      if ia < ib && lev(na, nb) <= Fuzzy.MaxEdits
    } yield (ia, ib)).toSet
    val got = Fuzzy.fuzzyNameJoin(spark, sf())
      .select("custkey_a", "custkey_b").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty, "sf0.001 must contain one-typo name pairs")
  }
}
