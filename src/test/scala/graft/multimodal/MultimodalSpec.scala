package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a,
    0x1a, 0x0a, 1, 2, 3)
  private val jpg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 4, 5)
  private val wav = Array[Byte]('R', 'I', 'F', 'F', 9, 9, 9, 9)

  test("mime sniffing from magic bytes") {
    assert(Multimodal.sniffMime(png) == "image/png")
    assert(Multimodal.sniffMime(jpg) == "image/jpeg")
    assert(Multimodal.sniffMime(wav) == "audio/wav")
    assert(Multimodal.sniffMime(Array[Byte](1, 2, 3)) ==
      "application/octet-stream")
  }

  test("media table wrap + per-partition feature extraction") {
    val df = Seq((1L, png), (2L, jpg), (3L, wav))
      .toDF("id", "bin").repartition(2)
    val media = Multimodal.asMediaTable(df, "id", "bin")
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "content", "meta"))
    val feats = Multimodal.extractFeatures(media, dim = 8)
    val rows = feats.orderBy("media_id").collect()
    assert(rows.length == 3)
    val f1 = rows(0).getAs[scala.collection.Seq[Float]]("features").toSeq
    assert(f1.length == 8)
    assert(f1.forall(v => v >= 0f && v <= 1f))
    // deterministic: same bytes → same features
    val again = Multimodal.extractFeatures(media, dim = 8)
      .orderBy("media_id").collect()(0)
      .getAs[scala.collection.Seq[Float]]("features").toSeq
    assert(f1 == again)
    // different bytes → different features
    val f2 = rows(1).getAs[scala.collection.Seq[Float]]("features").toSeq
    assert(f1 != f2)
  }

  test("frame sampling explodes deterministic offsets") {
    val df = Seq((1L, png)).toDF("id", "bin")
    val media = Multimodal.asMediaTable(df, "id", "bin")
      .withColumn("meta", struct(col("meta.mime"), col("meta.size_bytes"),
        col("meta.width"), col("meta.height"),
        lit(25000L).as("duration_ms")))
    val frames = Multimodal.sampleFrames(media, everyMs = 10000L).collect()
    assert(frames.map(_.getAs[Long]("offset_ms")).toSeq ==
      Seq(0L, 10000L, 20000L))
  }

  test("resize rewrites dimensions only") {
    val df = Seq((1L, png)).toDF("id", "bin")
    val media = Multimodal.asMediaTable(df, "id", "bin")
    val resized = Multimodal.resize(media, 64, 64).select("meta.*").head()
    assert(resized.getAs[Int]("width") == 64)
    assert(resized.getAs[Int]("height") == 64)
    assert(resized.getAs[String]("mime") == "image/png")
  }
}
