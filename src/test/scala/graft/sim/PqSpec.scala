package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PQ contracts beyond the hash gate: code-range/error invariants,
  * determinism, the search witness at spec SF, and the encode plan
  * shape. */
class PqSpec extends SparkSpec {

  test("q186 codes are in range and reconstruction error is consistent") {
    val rows = Pq.pqCodes(spark, sf()).collect()
    assert(rows.nonEmpty)
    val books = Pq.codebooks(spark, sf())
    val fixed = KMeans.fixedZone(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val q = fixed(id)
      var err = 0L
      (0 until Pq.M).foreach { m =>
        val c = r.getAs[Int](s"c$m")
        assert(c >= 0 && c < Pq.Ksub, s"code out of range at $id/$m: $c")
        val cent = books(m)(c)
        val slice = q.slice(m * Pq.SubDim, (m + 1) * Pq.SubDim)
        // the assigned centroid must be a MINIMIZER for this slice
        val dAssigned = slice.zip(cent)
          .map { case (x, y) => (x - y) * (x - y) }.sum
        books(m).foreach { other =>
          val d = slice.zip(other)
            .map { case (x, y) => (x - y) * (x - y) }.sum
          assert(dAssigned <= d, s"non-minimal code at $id subspace $m")
        }
        err += dAssigned
      }
      assert(r.getAs[Long]("qerr") == err, s"qerr drifted at $id")
    }
  }

  test("q187 search: witness holds at spec SF; ranks are dense per query") {
    val out = Pq.pqSearch(spark, sf()).collect()
    assert(out.length == Pq.NQueries * Pq.SearchK)
    assert(out.forall(_.getAs[Boolean]("meets_floor")),
      s"mean recall ${out.head.getAs[Double]("mean_recall")} " +
        s"under floor ${Pq.RecallFloor}")
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq ==
        (1 to Pq.SearchK), s"ranks not dense for query $q")
    }
    // deterministic across runs
    val again = Pq.pqSearch(spark, sf()).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q186 encode plan: map-side only over the fixed zone (no join)") {
    val plan = Pq.pqCodes(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"encode must not join:\n$plan")
  }
}
