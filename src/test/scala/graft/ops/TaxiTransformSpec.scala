package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

/** Semantic-trap regression suite for the verbatim reference transform
  * (SURVEY.md §5.2 item 4): dow offset, bin boundaries, tip cap,
  * div-by-zero guards, NULL handling. */
class TaxiTransformSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def mkRaw(rows: Seq[(String, String, Integer, Double, Int, Int,
      Double, Double, Double, Integer, java.lang.Double)]) =
    rows.map { case (pu, doo, pc, dist, pul, dol, fare, tip, total, pt, fee) =>
      (ts(pu), ts(doo), pc, dist, pul, dol, fare, tip, total, pt, fee)
    }.toDF("tpep_pickup_datetime", "tpep_dropoff_datetime",
      "passenger_count", "trip_distance", "PULocationID", "DOLocationID",
      "fare_amount", "tip_amount", "total_amount", "payment_type",
      "cbd_congestion_fee")

  test("validity filter drops non-positive durations/distances/amounts") {
    val raw = mkRaw(Seq(
      ("2025-01-05 10:00:00", "2025-01-05 10:10:00", 1, 2.0, 1, 2, 10.0, 1.0, 12.0, 1, 0.5),
      ("2025-01-05 10:10:00", "2025-01-05 10:00:00", 1, 2.0, 1, 2, 10.0, 1.0, 12.0, 1, 0.5), // dropoff < pickup
      ("2025-01-05 10:00:00", "2025-01-05 10:10:00", 1, 0.0, 1, 2, 10.0, 1.0, 12.0, 1, 0.5), // zero distance
      ("2025-01-05 10:00:00", "2025-01-05 10:10:00", 1, 2.0, 1, 2, 10.0, 1.0, -1.0, 1, 0.5))) // negative total
    assert(TaxiTransform.transform(raw).count() == 1)
  }

  test("dow is Postgres semantics: Sunday = 0") {
    // 2025-01-05 is a Sunday; 2025-01-06 a Monday
    val raw = mkRaw(Seq(
      ("2025-01-05 10:00:00", "2025-01-05 10:10:00", 1, 2.0, 1, 2, 10.0, 0.0, 12.0, 1, 0.0),
      ("2025-01-06 10:00:00", "2025-01-06 10:10:00", 1, 2.0, 1, 2, 10.0, 0.0, 12.0, 1, 0.0)))
    val dows = TaxiTransform.transform(raw)
      .orderBy("pickup_datetime")
      .select("pickup_day_of_week").collect().map(_.getInt(0))
    assert(dows.toSeq == Seq(0, 1))
  }

  test("duration bins: exclusive upper bounds at exactly 5/15/30/60 min") {
    val raw = mkRaw(Seq(
      ("2025-01-05 10:00:00", "2025-01-05 10:04:59", 1, 1.0, 1, 2, 10.0, 0.0, 10.0, 1, 0.0),
      ("2025-01-05 10:00:00", "2025-01-05 10:05:00", 1, 1.0, 1, 2, 10.0, 0.0, 10.0, 1, 0.0),
      ("2025-01-05 10:00:00", "2025-01-05 10:15:00", 1, 1.0, 1, 2, 10.0, 0.0, 10.0, 1, 0.0),
      ("2025-01-05 10:00:00", "2025-01-05 10:30:00", 1, 1.0, 1, 2, 10.0, 0.0, 10.0, 1, 0.0),
      ("2025-01-05 10:00:00", "2025-01-05 11:00:00", 1, 1.0, 1, 2, 10.0, 0.0, 10.0, 1, 0.0)))
    val cats = TaxiTransform.transform(raw)
      .orderBy("dropoff_datetime")
      .select("trip_category").collect().map(_.getString(0))
    assert(cats.toSeq == Seq(
      "Very Short", "Short", "Medium", "Long", "Very Long"))
  }

  test("tip percentage: div-by-zero guard and 999.99 cap") {
    val raw = mkRaw(Seq(
      ("2025-01-05 10:00:00", "2025-01-05 10:10:00", 1, 1.0, 1, 2, 0.0, 5.0, 5.0, 1, 0.0),   // fare 0 → 0
      ("2025-01-05 10:00:00", "2025-01-05 10:11:00", 1, 1.0, 1, 2, 0.01, 5.0, 5.0, 1, 0.0),  // 50000% → cap
      ("2025-01-05 10:00:00", "2025-01-05 10:12:00", 1, 1.0, 1, 2, 10.0, 2.0, 12.0, 1, 0.0))) // 20%
    val tips = TaxiTransform.transform(raw)
      .orderBy("dropoff_datetime")
      .select("tip_percentage").collect().map(_.getDouble(0))
    assert(tips.toSeq == Seq(0.0, 999.99, 20.0))
  }

  test("NULL payment_type decodes to 'Other'; NULL fee coalesces to 0") {
    val raw = mkRaw(Seq(
      ("2025-01-05 10:00:00", "2025-01-05 10:10:00", 1, 1.0, 1, 2, 10.0, 0.0, 10.0, null, null),
      ("2025-01-05 10:00:00", "2025-01-05 10:11:00", 1, 1.0, 1, 2, 10.0, 0.0, 10.0, 4, 2.75)))
    val rows = TaxiTransform.transform(raw).orderBy("dropoff_datetime")
      .select("payment_method", "congestion_fee").collect()
    assert(rows(0).getString(0) == "Other" && rows(0).getDouble(1) == 0.0)
    assert(rows(1).getString(0) == "Dispute" && rows(1).getDouble(1) == 2.75)
  }

  test("18-column output contract and one-pass summary") {
    val raw = mkRaw(Seq(
      ("2025-01-05 10:00:00", "2025-01-05 10:10:00", 2, 4.0, 1, 2, 10.0, 2.0, 12.0, 1, 0.0)))
    val cleaned = TaxiTransform.transform(raw)
    // the reference's INSERT column list, verbatim order
    // (taxi_transform_dag.py:43-49)
    assert(cleaned.columns.toSeq == Seq(
      "pickup_datetime", "dropoff_datetime", "trip_duration_minutes",
      "pickup_hour", "pickup_day_of_week", "pickup_month",
      "trip_distance", "fare_amount", "tip_amount", "tip_percentage",
      "total_amount", "payment_method", "passenger_count",
      "revenue_per_mile", "trip_category", "congestion_fee",
      "pickup_location_id", "dropoff_location_id"))
    val s = TaxiTransform.summary(cleaned).collect().head
    assert(s.getAs[Long]("total_trips") == 1L)
    assert(s.getAs[Double]("avg_distance") == 4.0)
    assert(s.getAs[Double]("avg_tip_pct") == 20.0)
  }
}
