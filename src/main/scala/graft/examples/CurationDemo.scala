package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable end-to-end drive of the training-data curation surface —
  * the north-star pipeline as a user of the library would compose it,
  * over the synthetic `documents` testdata:
  *
  *   1. near-dup clusters (MinHash-LSH pairs → connected components)
  *   2. LEAKAGE-SAFE train/val/test split (hash the cluster label)
  *   3. train-set decontamination (drop docs carrying eval 5-grams)
  *   4. quality floor (duplicated-n-gram boilerplate fraction)
  *   5. stratified proportional sample of what survives
  *
  * Every stage is the same operator the oracle gates (q37/q98, q138,
  * q141, q140, q142); this program just shows them composing, with
  * the funnel counts printed at each stage.
  *
  * Usage: runMain graft.examples.CurationDemo [sfDir]
  */
object CurationDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val total = graft.Tables.load(spark, dir, "documents").count()
    println(s"corpus: $total docs")

    // 1-2. leakage-safe split already folds in the cluster labels
    val split = graft.dedup.Dedup.leakageSafeSplit(spark, dir)
    split.groupBy("split").count().orderBy("split").show()

    // 3. decontaminate the train partition against the eval grams
    val decon = graft.text.TextAnalysis.decontaminate(spark, dir)
    val kept = decon.where(col("kept"))
    println(s"decontamination: ${decon.count()} train docs, " +
      s"${kept.count()} kept")

    // 4. boilerplate floor: duplicated-5-gram fraction below 50%
    val clean = graft.text.CorpusStats.dupGramFraction(spark, dir)
      .where(col("dup_fraction") < 0.5)
    println(s"boilerplate floor keeps ${clean.count()} docs")

    // 5. survivors = clean ∩ kept ∩ train; stratified 10% sample
    val survivors = kept.select("doc_id")
      .join(clean.select("doc_id"), "doc_id")
    println(s"survivors: ${survivors.count()}")
    val sample = graft.ops.Sampling.stratifiedSample(spark, dir,
      target = (total / 10).toInt)
    sample.groupBy("source").count().orderBy("source").show(5)
    println("curation demo complete")
    spark.stop()
  }
}
