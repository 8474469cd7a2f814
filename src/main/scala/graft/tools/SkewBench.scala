package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: the salted-vs-plain measurement behind SkewStressSpec's
  * pins, across the regimes that matter — printed as JSONL for
  * records/skew_salted_r11.json. Honest by construction: it records
  * the regime where salting WINS (reduce-heavy one-to-many join, hot
  * reducer on the critical path), the regime where it DOESN'T (1:1
  * join whose balanced map/shuffle stage dominates — the salt's dim
  * replication is pure overhead), and the agg shape (sum/count group
  * skew is absorbed by map-side partial aggregation BEFORE the
  * shuffle, so there is no hot reducer for a salt to spread). Each
  * row carries wall times (min of two) and the max reducer-partition
  * row count — the deterministic spread number that is the actual
  * 100 TB claim.
  *
  * Usage: runMain graft.tools.SkewBench
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-skew-bench")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val n = 32000000L
    def fact = spark.range(n).select(
      when(col("id") < n * 95 / 100, 0L)
        .otherwise(pmod(col("id"), lit(50000L))).as("k"),
      (col("id") % 97).as("v"))
    def dim(perKey: Int) = spark.range(50000L * perKey)
      .select(expr(s"id div $perKey").as("k"), (col("id") % 7 + 1).as("d"))
    def agg(df: DataFrame): Unit = {
      df.agg(count(lit(1)),
        sum(pmod(xxhash64(col("v"), col("d")), lit(1000000L))))
        .collect(): Unit
    }
    def once(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // fairness: warm both shapes untimed, then ALTERNATE the timed
    // passes (a fixed order hands the later shape a warmer JVM)
    def timedPair(p: => Unit, s: => Unit): (Double, Double) = {
      p; s
      val (p1, s1) = (once(p), once(s))
      val (p2, s2) = (once(p), once(s))
      (math.min(p1, p2), math.min(s1, s2))
    }
    def maxPart(df: DataFrame): Long = df
      .select(spark_partition_id().as("p")).groupBy("p").count()
      .agg(max(col("count"))).collect()(0).getLong(0)

    def joinRow(regime: String, perKey: Int): Unit = {
      val plain = fact.join(dim(perKey), "k")
      val salted = graft.ops.SkewJoin
        .saltedEquiJoin(fact, dim(perKey), Seq("k"), salt = 16)
      val (tp, ts) = timedPair(agg(plain), agg(salted))
      val (pm, sm) = (maxPart(plain), maxPart(salted))
      println(f"""{"regime":"$regime","per_key":$perKey,""" +
        f""""plain_sec":$tp%.2f,"salted_sec":$ts%.2f,""" +
        f""""plain_max_part_rows":$pm,"salted_max_part_rows":$sm}""")
    }
    joinRow("join_reduce_heavy_1_to_10", 10)
    joinRow("join_1_to_1", 1)

    // agg shape: q49's two-level salt vs the plain groupBy — partial
    // agg already collapses the hot group map-side
    import org.apache.spark.sql.types.DecimalType
    val D = DecimalType(18, 2)
    def ev = spark.range(n).select(
      when(col("id") < n * 9 / 10, lit("hot"))
        .otherwise(concat(lit("t"), pmod(col("id"), lit(50)))).as("event_type"),
      (col("id") % 1000).cast("double").as("value"),
      col("id").as("event_id"))
    val (tPlainAgg, tSaltAgg) = timedPair(
      ev.groupBy(col("event_type"))
        .agg(count(lit(1)), sum(col("value").cast(D)))
        .collect(): Unit,
      ev.withColumn("salt", pmod(xxhash64(col("event_id")), lit(16)))
        .groupBy(col("event_type"), col("salt"))
        .agg(count(lit(1)).as("pn"), sum(col("value").cast(D)).as("psum"))
        .groupBy(col("event_type"))
        .agg(sum(col("pn")), sum(col("psum")))
        .collect(): Unit)
    println(f"""{"regime":"agg_sum_count","plain_sec":$tPlainAgg%.2f,""" +
      f""""salted_sec":$tSaltAgg%.2f}""")
    spark.stop()
  }
}
