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
