package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet-table loader for the engine's zone/table layout.
  *
  * The reference keeps relational tables in named Postgres schemas
  * (`raw` / `analytics`, reference `sql/init.sql:2-3`); the Spark-native
  * equivalent is a directory of parquet tables (`<dir>/<table>.parquet`).
  * At cluster scale each table would be a partitioned parquet dataset
  * (or catalog table) — the read path is identical.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table. Column pruning + predicate pushdown happen at the
    * parquet scan automatically because callers stay declarative.
    *
    * Timestamp normalization: the testdata parquet stores timestamps as
    * NTZ (and `events.ts` as nanoseconds, which Spark's vectorized
    * reader rejects outright). All engine code works in session-UTC
    * `TimestampType`, so we (a) read nanos as long via the legacy conf
    * and rebuild a micros timestamp, and (b) cast NTZ columns to LTZ —
    * identity under the UTC session this engine mandates. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") return loadEvents(spark, dir)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    normalizeTimestamps(df)
  }

  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    // Session-wide by necessity: the conf is consulted both at schema
    // resolution and at scan execution, so it cannot be set-and-
    // restored around this read. Documented trade-off: after events is
    // touched, INT64-nanos timestamp columns in OTHER parquet sources
    // read as raw longs instead of erroring (they would otherwise
    // fail the read outright — Spark has no lossless nanos path).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    // Two generator layouts exist: INT64 nanoseconds (reads as LONG
    // under nanosAsLong; truncate to micros with integer `div` —
    // double division would lose precision at 1e18 magnitude, and
    // DuckDB truncates ns the same way) or native timestamp[us]
    // (nothing to convert). Dispatch on the OBSERVED schema instead
    // of assuming one writer.
    val converted = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
    normalizeTimestamps(converted)
  }

  private def normalizeTimestamps(df: DataFrame): DataFrame = {
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
    ntz.foldLeft(df) { (d, f) =>
      d.withColumn(f.name, col(f.name).cast(TimestampType))
    }
  }
}
