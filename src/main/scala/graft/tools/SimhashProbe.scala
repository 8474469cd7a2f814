package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val sigs = Dedup.simhashSignatures(spark, dir).cache()
    val a = sigs.select(col("doc_id").as("id1"), col("simhash").as("h1"))
    val b = sigs.select(col("doc_id").as("id2"), col("simhash").as("h2"))
    val all = a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
    val truth = spark.read.parquet("/tmp/verify_out/q37_minhash_lsh")
      .select(col("id1"), col("id2"), lit(1).as("is_dup"))
    val j = all.join(truth, Seq("id1", "id2"), "left")
    println("TRUE-PAIR hamming distribution:")
    j.where(col("is_dup") === 1).groupBy("hamming").count()
      .orderBy("hamming").show(40)
    println("NON-PAIR hamming distribution (lowest 15):")
    j.where(col("is_dup").isNull).groupBy("hamming").count()
      .orderBy("hamming").show(15)
    spark.stop()
  }
}
