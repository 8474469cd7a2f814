package graft.sinks

import graft.SparkSpec

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("describeTable lists columns and types") {
    Seq((1L, "x", 1.5)).toDF("id", "name", "score")
      .createOrReplaceTempView("wh_t")
    assert(Warehouse.describeTable(spark, "wh_t") ==
      Seq("id" -> "bigint", "name" -> "string", "score" -> "double"))
  }

  test("executeScript runs each statement, returns the last result") {
    val out = Warehouse.executeScript(spark,
      """CREATE OR REPLACE TEMP VIEW wh_s AS SELECT 41 AS v;
        |SELECT v + 1 AS answer FROM wh_s;""".stripMargin)
    assert(out.get.collect().head.getInt(0) == 42)
  }

  test("connectivity probe") {
    assert(Warehouse.probe(spark))
  }

  test("tableStats reports files, bytes, rows, columns") {
    val dir = java.nio.file.Files.createTempDirectory("stats").toString + "/t"
    graft.Tables.load(spark, sf(), "nation").repartition(3)
      .write.parquet(dir)
    val st = Warehouse.tableStats(spark, dir)
    assert(st.files == 3 && st.rows == 25 && st.columns == 3)
    assert(st.bytes > 0)
  }
}
