package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's cleaning transform, verbatim semantics: raw taxi
  * trips → the 18-column `analytics.taxi_trips_cleaned` contract
  * (reference dags/taxi_transform_dag.py:38-86). Column-for-column:
  * 6 passthroughs with renames, 12 derived expressions, and the
  * 3-way validity filter — every Postgres-vs-Spark semantic gap from
  * SURVEY.md §4.3 handled in expression construction:
  *
  *  - `EXTRACT(dow)` is Postgres 0=Sunday (Spark dayofweek − 1);
  *  - tip percentage divides as double and caps at 999.99;
  *  - duration divides epoch seconds by 60.0 (double minutes);
  *  - `payment_type` NULL falls to 'Other' (CASE else-branch);
  *  - `cbd_congestion_fee` NULL coalesces to 0.
  */
object TaxiTransform {

  /** P1: dropoff after pickup, positive distance, non-negative total
    * (reference taxi_transform_dag.py:76-78). */
  def validityFilter: Column =
    col("tpep_dropoff_datetime") > col("tpep_pickup_datetime") &&
      col("trip_distance") > 0 && col("total_amount") >= 0

  def transform(raw: DataFrame): DataFrame = {
    val pickup = col("tpep_pickup_datetime")
    val dropoff = col("tpep_dropoff_datetime")
    val durationMin =
      (unix_timestamp(dropoff) - unix_timestamp(pickup)) / lit(60.0)
    // Column names AND order are the reference's INSERT list verbatim
    // (taxi_transform_dag.py:43-49): pickup_datetime … dropoff_location_id.
    raw.filter(validityFilter).select(
      pickup.as("pickup_datetime"),
      dropoff.as("dropoff_datetime"),
      durationMin.as("trip_duration_minutes"),
      hour(pickup).as("pickup_hour"),
      (dayofweek(pickup) - 1).as("pickup_day_of_week"), // 0=Sunday (pg)
      month(pickup).as("pickup_month"),
      col("trip_distance"),
      col("fare_amount"),
      col("tip_amount"),
      when(col("fare_amount") > 0,
        least(col("tip_amount") / col("fare_amount") * 100, lit(999.99)))
        .otherwise(lit(0.0)).as("tip_percentage"),
      col("total_amount"),
      when(col("payment_type") === 1, "Credit Card")
        .when(col("payment_type") === 2, "Cash")
        .when(col("payment_type") === 3, "No Charge")
        .when(col("payment_type") === 4, "Dispute")
        .otherwise("Other").as("payment_method"),
      col("passenger_count"),
      when(col("trip_distance") > 0,
        col("total_amount") / col("trip_distance"))
        .otherwise(lit(0.0)).as("revenue_per_mile"),
      when(durationMin < 5, "Very Short")
        .when(durationMin < 15, "Short")
        .when(durationMin < 30, "Medium")
        .when(durationMin < 60, "Long")
        .otherwise("Very Long").as("trip_category"),
      coalesce(col("cbd_congestion_fee"), lit(0.0))
        .as("congestion_fee"),
      col("PULocationID").as("pickup_location_id"),
      col("DOLocationID").as("dropoff_location_id"))
  }

  /** A2: the reference's one-pass summary (taxi_transform_dag.py:92-95). */
  def summary(cleaned: DataFrame): DataFrame =
    cleaned.agg(
      count(lit(1)).as("total_trips"),
      avg(col("trip_distance")).as("avg_distance"),
      avg(col("total_amount")).as("avg_total"),
      avg(col("tip_percentage")).as("avg_tip_pct"))
}
