package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic contracts of the q212–q215 mining/governance operators
  * (the oracle gate checks cross-engine equality; these check the
  * DEFINITIONS against brute force and the operators' invariants). */
class MiningSpec extends SparkSpec {

  test("q212: sweep front equals brute-force dominance") {
    val rows = Mining.paretoFront(spark, sf())
      .select("doc_id", "n_chars", "w_sum", "on_front").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(rows.nonEmpty)
    val pts = rows.map(r => (r._2, r._3))
    rows.foreach { case (id, x, y, flag) =>
      val dominated = pts.exists { case (qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y)
      }
      assert(flag == !dominated, s"doc $id: on_front=$flag")
    }
    // the front is never empty: the doc maximizing (x, then y) is
    // undominated by construction
    assert(rows.exists(_._4))
  }

  test("q212: duplicated extreme points survive together (tie rule)") {
    // two docs equal on BOTH dims dominate each other under neither
    // arm of the strict clause — both must stay on the front
    val rows = Mining.paretoFront(spark, sf()).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val byPoint = rows.groupBy(r => (r._1, r._2))
    byPoint.values.foreach { grp =>
      assert(grp.map(_._3).distinct.size == 1,
        "identical points must share one verdict")
    }
  }

  test("q213: bitmap rollup equals exact count(DISTINCT)") {
    val got = Mining.bitmapDistinct(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val ev = spark.read.parquet(s"${sf()}/events.parquet")
      .where(col("user_id").isNotNull)
    val exactBy = ev.groupBy("event_type")
      .agg(count(lit(1)), countDistinct(col("user_id"))).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val allUsers = ev.select(countDistinct(col("user_id"))).head.getLong(0)
    assert(got.nonEmpty)
    got.foreach { case (t, nEv, nU, nAll) =>
      assert((nEv, nU) == exactBy(t), s"type $t")
      assert(nAll == allUsers)
    }
    assert(got.map(_._1).toSet == exactBy.keySet)
  }

  test("q214: group sizes are exact and the flag is the threshold") {
    val out = Mining.kAnonymity(spark, sf()).collect()
      .map(r => ((Option(r.getString(1)), Option(r.getString(2)),
        r.getLong(3)), r.getLong(4), r.getBoolean(5)))
    val sizes = out.groupBy(_._1).map { case (k, vs) => (k, vs.length.toLong) }
    out.foreach { case (qi, gs, risk) =>
      assert(gs == sizes(qi), s"group $qi size")
      assert(risk == (gs < Mining.K))
    }
    // audit covers every document exactly once
    val n = spark.read.parquet(s"${sf()}/documents.parquet").count()
    assert(out.length.toLong == n)
  }

  test("q215: Apriori pruning is lossless vs the unpruned definition") {
    val pruned = Mining.assocRules(spark, sf())
      .select("antecedent", "consequent", "n_ab").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // unpruned: every co-occurring pair, thresholded at the end only
    val it = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"),
        explode(graft.util.Tokens.whitespace(col("text"))).as("tok"))
      .distinct()
    val n = spark.read.parquet(s"${sf()}/documents.parquet").count()
    val ic = it.groupBy("tok").agg(count(lit(1)).as("c"))
    val pairs = it.as("a")
      .join(it.as("b"), col("a.doc_id") === col("b.doc_id") &&
        col("a.tok") < col("b.tok"))
      .groupBy(col("a.tok").as("ta"), col("b.tok").as("tb"))
      .agg(count(lit(1)).as("cab"))
    val bi = pairs.select(col("ta").as("x"), col("tb").as("y"), col("cab"))
      .unionByName(pairs.select(col("tb").as("x"), col("ta").as("y"),
        col("cab")))
    val full = bi
      .join(ic.select(col("tok").as("x"), col("c").as("ca")), "x")
      .join(ic.select(col("tok").as("y"), col("c").as("cb")), "y")
      .where(col("cab") * Mining.SupPctX10 >= lit(n) &&
        col("cab") * 5 >= col("ca") * 3 &&
        col("cab") * lit(n) > col("ca") * col("cb"))
      .select(col("x"), col("y"), col("cab")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(pruned == full)
    assert(pruned.nonEmpty)
  }

  test("q219: the epoch chain time-travels — erase then restore") {
    import graft.sinks.MergeOnRead
    // the gate query builds (or finds) the zone; epochs are then
    // directly inspectable: asOf=0 is the untouched base, asOf=1 has
    // the erasure applied but not yet the restore
    val root = Mining.erasureZone(spark, sf()) // builds if absent
    val base = spark.read.parquet(s"${sf()}/documents.parquet")
    val n = base.count()
    val erased = base.where(org.apache.spark.sql.functions
      .col("doc_id") % 97 === 0).count()
    val restored = base.where(org.apache.spark.sql.functions
      .col("doc_id") % 97 === 0 &&
      org.apache.spark.sql.functions.col("doc_id") % 2 === 0).count()
    assert(MergeOnRead.read(spark, root, Seq("doc_id"), asOf = 0L)
      .count() == n)
    assert(MergeOnRead.read(spark, root, Seq("doc_id"), asOf = 1L)
      .count() == n - erased)
    assert(MergeOnRead.read(spark, root, Seq("doc_id"))
      .count() == n - erased + restored)
  }

  test("q225: a one-row tamper flips exactly its bucket's digest") {
    import graft.dedup.Md5Prefix
    val src = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"))
    def dig(df: org.apache.spark.sql.DataFrame) = df
      .select(pmod(col("doc_id"), lit(Mining.DigestBuckets))
          .as("bucket"),
        Md5Prefix.h(concat_ws("|", col("doc_id").cast("string"),
          col("source"), col("n_chars").cast("string"))).as("h"))
      .groupBy("bucket").agg(expr("bit_xor(h)").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clean = dig(src)
    val victim = src.select(min(col("doc_id"))).head.getLong(0)
    val tampered = dig(src.withColumn("n_chars",
      when(col("doc_id") === victim, col("n_chars") + 1)
        .otherwise(col("n_chars"))))
    val diff = clean.keySet.filter(b => clean(b) != tampered(b))
    assert(diff == Set(victim % Mining.DigestBuckets),
      s"tamper must flip exactly one bucket, got $diff")
  }

  test("q243: histogram-folded Gini equals the sorted definition") {
    val row = Mining.giniTokens(spark, sf()).head
    val gini = row.getDouble(3)
    assert(gini >= 0.0 && gini < 1.0)
    // brute force: sort values, Gini = 2Σi·x(i)/(nΣx) − (n+1)/n
    val xs = graft.text.CorpusStats.linearQuality(spark, sf())
      .select("n_tokens").collect().map(_.getLong(0)).sorted
    val n = xs.length.toLong
    val s = xs.sum
    val si = xs.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
    val want = 2.0 * si / (n.toDouble * s) - (n + 1.0) / n
    assert(math.abs(gini - want) < 1e-12)
  }

  test("q239/q247: contingency cells are complete and consistent") {
    Seq(Mining.chiSquareCells(spark, sf()),
      Mining.splitUniformity(spark, sf())).foreach { df =>
      val rows = df.collect()
      val n = rows.head.getLong(5)
      assert(rows.map(_.getLong(2)).sum == n) // Σo = n
      rows.foreach { r =>
        assert(r.getDouble(7) >= 0.0) // contributions non-negative
        assert(r.getLong(3) <= n && r.getLong(4) <= n)
      }
    }
  }

  test("q249: near-dup families never straddle a fold") {
    val rows = graft.dedup.Dedup.clusterFolds(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.forall(r => r._3 >= 0 && r._3 < 5))
    rows.groupBy(_._2).foreach { case (c, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $c split across folds")
      assert(members.forall(_._4 == members.length))
    }
  }

  test("q215: rule invariants (support, confidence, lift, bounds)") {
    val n = spark.read.parquet(s"${sf()}/documents.parquet").count()
    val rows = Mining.assocRules(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ab, a, b, nd) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nd == n)
      assert(ab <= math.min(a, b)) // co-occurrence ≤ item supports
      assert(ab * Mining.SupPctX10 >= nd)
      assert(ab * 5 >= a * 3)
      assert(ab * nd > a * b)
      assert(math.abs(r.getDouble(6) - ab.toDouble / a) == 0.0)
      assert(math.abs(
        r.getDouble(7) - (ab * nd).toDouble / (a * b)) == 0.0)
    }
  }

  test("q277: moments of a symmetric distribution (hand-computed)") {
    import spark.implicits._
    // v = 1..4 per group: mean 2.5, m2 1.25, skew EXACTLY 0.0
    // (every intermediate is IEEE-representable), kurtosis
    // 2.5625 / (1.25 * 1.25)
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L))
      .toDF("g", "v")
    val r = Mining.momentsOf(df, "g").collect()(0)
    assert(r.getLong(1) == 4L && r.getLong(2) == 10L &&
      r.getLong(3) == 30L && r.getLong(4) == 100L &&
      r.getLong(5) == 354L)
    assert(r.getDouble(6) == 2.5)
    assert(r.getDouble(7) == 1.25)
    assert(r.getDouble(8) == 0.0, s"symmetric => zero skew: $r")
    assert(r.getDouble(9) == 2.5625 / (1.25 * 1.25))
  }
}
