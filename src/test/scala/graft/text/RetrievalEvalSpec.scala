package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Independent brute-force ground truth for the q199 retrieval eval:
  * re-derives the hashed-TF vectors, gold sample, ranks and metrics
  * in plain Scala (JVM md5, no Spark expressions) and compares the
  * per-source report exactly. */
class RetrievalEvalSpec extends SparkSpec {

  /** 60-bit md5-prefix hash — the [[graft.dedup.Md5Prefix]] contract
    * re-implemented independently. */
  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("q199 equals a plain-Scala brute-force eval at sf0.001") {
    val dir = sf()
    // the chunk relation is the shared zone — the eval's input
    // contract, not what this spec re-derives
    val chunks = CorpusStats.chunkZone(spark, dir)
      .select("doc_id", "j", "ctext").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getString(2)))
    val srcOf = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def vec(text: String): Map[Int, Long] =
      text.split(" ", -1).toSeq
        .groupBy(t => (h60(t) % TextVectors.Dim).toInt)
        .view.mapValues(_.size.toLong).toMap
    val vecs = chunks.map { case (d, j, t) => (d, j) -> vec(t) }.toMap
    def dot(a: Map[Int, Long], b: Map[Int, Long]): Long =
      a.iterator.map { case (k, v) => v * b.getOrElse(k, 0L) }.sum
    val n2 = vecs.view.mapValues(v => dot(v, v)).toMap
    val chunkIds = chunks.map(c => (c._1, c._2)).toSet
    val gold = chunks.map(c => (c._1, c._2))
      .filter { case (d, j) => chunkIds.contains((d, j + 1)) }
      .filter { case (d, j) =>
        h60(s"$d:$j") % RetrievalEval.SampleMod == 0 }
    case class M(n: Long, h1: Long, h5: Long, h10: Long, fp: Long)
    val per = gold.map { case (qd, qj) =>
      val qv = vecs((qd, qj)); val qn2 = n2((qd, qj))
      def cos(id: (Long, Long)): Double = {
        val dt = dot(qv, vecs(id))
        if (dt <= 0) Double.NaN
        else dt.toDouble / math.sqrt((qn2 * n2(id)).toDouble)
      }
      val g = cos((qd, qj + 1))
      if (g.isNaN) (srcOf(qd), 0L, 0L, 0L, 0L)
      else {
        val better = chunkIds.toSeq
          .filter(id => id != (qd, qj))
          .count { id =>
            val c = cos(id)
            !c.isNaN && (c > g || (c == g &&
              (id._1 < qd || (id._1 == qd && id._2 < qj + 1))))
          }
        val rnk = 1L + better
        (srcOf(qd),
          if (rnk <= 1) 1L else 0L,
          if (rnk <= 5) 1L else 0L,
          if (rnk <= RetrievalEval.KMax) 1L else 0L,
          if (rnk <= RetrievalEval.KMax) 65536L / rnk else 0L)
      }
    }
    val want = per.groupBy(_._1).map { case (src, rs) =>
      src -> M(rs.size.toLong, rs.map(_._2).sum, rs.map(_._3).sum,
        rs.map(_._4).sum, rs.map(_._5).sum)
    }
    val got = RetrievalEval.retrievalEval(spark, dir).collect()
      .map { r =>
        val n = r.getAs[Long]("n_queries")
        val m = M(n, r.getAs[Long]("hits_at_1"),
          r.getAs[Long]("hits_at_5"), r.getAs[Long]("hits_at_10"),
          math.round(r.getAs[Double]("mrr") * 65536.0 * n))
        r.getAs[String]("source") -> m
      }.toMap
    assert(got == want, s"got $got\nwant $want")
    assert(want.values.map(_.n).sum > 10, "sample too thin at spec SF")
    // the 100 TB drop as API (round-11 uniformity): witness-free mode
    // loses the count-better scan and the rank metrics, keeps the
    // linear gold-coverage report with the SAME query universe
    val free = RetrievalEval.retrievalEval(spark, dir,
      withWitness = false).collect()
    assert(free.head.schema.fieldNames.toSeq ==
      Seq("source", "n_queries", "n_gold_scored", "mean_gold_cos"))
    val freeN = free.map(r =>
      r.getAs[String]("source") -> r.getAs[Long]("n_queries")).toMap
    assert(freeN == want.map { case (s, m) => s -> m.n })
  }
}
