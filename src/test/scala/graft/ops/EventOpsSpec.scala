package graft.ops

import graft.SparkSpec

/** Semantic contracts of the SCD Type-2 interval build (q218) — the
  * oracle gate proves cross-engine equality; these prove the
  * INTERVAL ALGEBRA: islands partition the stream, intervals chain
  * without gaps or overlaps, and consecutive islands really changed
  * state. */
class EventOpsSpec extends SparkSpec {

  private lazy val rows = EventOps.scd2Intervals(spark, sf()).collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)),
      r.getBoolean(4), r.getLong(5)))

  test("q218: islands partition the event stream exactly") {
    val total = spark.read.parquet(s"${sf()}/events.parquet").count()
    assert(rows.map(_._6).sum == total)
    assert(rows.forall(_._6 >= 1))
  }

  test("q224: each probe resolves to the latest state at its time") {
    import org.apache.spark.sql.functions._
    val got = EventOps.pitJoin(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    val ev = graft.Tables.load(spark, sf(), "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ms")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    assert(got.length == ev.length) // every probe matched exactly once
    val byUser = ev.groupBy(_._2)
    got.foreach { case (eid, u, t, state) =>
      // brute force: the event_type of the LATEST event ≤ t (ties on
      // ms broken by event_id, matching the interval build's order)
      val latest = byUser(u).filter(_._4 <= t)
        .maxBy(e => (e._4, e._1))._3
      assert(state == latest, s"probe $eid")
    }
  }

  test("q227: funnel steps are ordered, inside deadline, and greedy") {
    import org.apache.spark.sql.functions._
    val rows = EventOps.orderedFunnel(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t1 = r.getLong(1)
      val t2 = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val t3 = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val reached = r.getLong(4)
      assert(t3.isEmpty || t2.nonEmpty) // no step skipping
      t2.foreach(t => assert(t >= t1 && t <= t1 + 1800000L))
      t3.foreach(t => assert(t >= t2.get && t <= t2.get + 1800000L))
      assert(reached ==
        (if (t3.nonEmpty) 3L else if (t2.nonEmpty) 2L else 1L))
    }
    // one row per user with a view event — the funnel's entry gate
    val nViewUsers = graft.Tables.load(spark, sf(), "events")
      .where(col("event_type") === "view")
      .select(col("user_id")).distinct().count()
    assert(rows.length.toLong == nViewUsers)
  }

  test("q250: dense-grid coverage makes the two baselines comparable") {
    val rows = EventOps.seasonalNaive(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nSeas, nN1) = (r.getLong(2), r.getLong(4))
      // on a contiguous day range the seasonal join loses exactly the
      // first 24 grid hours where the naive loses 1
      assert(nSeas == nN1 - 23, s"${r.getString(0)}: $nSeas vs $nN1")
      assert(r.getLong(1) >= 0 && r.getLong(3) >= 0)
    }
  }

  test("q258: credit shares are a partition of each purchase") {
    val rows = EventOps.decayAttribution(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4),
        r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, h, w, _) =>
      assert(h >= 0 && h <= 23)
      assert(w == (1L << (23 - h).toInt))
    }
    rows.groupBy(_._1).foreach { case (p, cs) =>
      val total = cs.map(_._4).sum
      assert(math.abs(total - 1.0) < 1e-9, s"purchase $p credits $total")
    }
  }

  test("q218: intervals chain per user — each closes at the next start") {
    rows.groupBy(_._1).foreach { case (u, ivs) =>
      val seq = ivs.sortBy(_._3)
      seq.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"user $u: gap or overlap")
          // a merged island means consecutive intervals differ in state
          assert(a._2 != b._2, s"user $u: un-merged duplicate state")
        case _ => ()
      }
      // exactly one open (current) interval per user, and it is the last
      assert(seq.count(_._5) == 1)
      assert(seq.last._5 && seq.last._4.isEmpty)
      assert(seq.init.forall(iv => !iv._5 && iv._4.nonEmpty))
    }
  }
  test("q281: stationary mass is conserved up to floor-division leak") {
    val total = EventOps.markovStationary(spark, sf()).collect()
      .map(_.getAs[Long]("mass_fp"))
    assert(total.forall(_ >= 0L))
    val types = total.length
    // start mass = types * MarkovScale; each round can only leak
    // (floor division + dangling states), never create
    assert(total.sum <= types * EventOps.MarkovScale,
      s"mass grew: ${total.sum}")
    assert(total.sum > 0L, "all mass leaked - degenerate chain")
  }
}
