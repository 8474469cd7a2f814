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

  test("media table wrap + REAL per-partition feature extraction") {
    // uniform gray-100 8×8 PPM: every 4×4 cell's mean luma is 100, so
    // the L2-normalized embedding is exactly 0.25f in all 16 slots
    // (norm = sqrt(16·100²) = 400); truncated png/wav bytes decode to
    // nothing → null features, never fabricated ones
    val uniform = Ppm.encode(Ppm.Image(8, 8, Array.fill(8 * 8 * 3)(100.toByte)))
    val df = Seq((1L, uniform), (2L, png), (3L, wav))
      .toDF("id", "bin").repartition(2)
    val media = Multimodal.asMediaTable(df, "id", "bin")
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "content", "meta"))
    val rows = Multimodal.extractFeatures(media, dim = 16)
      .orderBy("media_id").collect()
    assert(rows.length == 3)
    val f1 = rows(0).getAs[scala.collection.Seq[Float]]("features").toSeq
    assert(f1 == Seq.fill(16)(0.25f), s"got $f1")
    assert(rows(1).getAs[AnyRef]("features") == null)
    assert(rows(2).getAs[AnyRef]("features") == null)
    // non-square dim is a programming error, caught up front
    intercept[IllegalArgumentException] {
      Multimodal.extractFeatures(media, dim = 8)
    }
  }

  test("lumaGrid: hand-computed cell means and L2 normalization") {
    // 4×4 gray blocks (r=g=b=v → integer luma exactly v): 2×2 grid
    // cells average to 10, 20, 30, 40; norm = sqrt(3000)
    val vals = Array(10, 10, 20, 20, 10, 10, 20, 20,
      30, 30, 40, 40, 30, 30, 40, 40)
    val rgb = vals.flatMap(v => Array(v.toByte, v.toByte, v.toByte))
    val got = Ppm.lumaGrid(Ppm.Image(4, 4, rgb), 2).toSeq
    val norm = math.sqrt(100.0 + 400.0 + 900.0 + 1600.0)
    assert(got == Seq(10f, 20f, 30f, 40f).map(v =>
      (v.toDouble / norm).toFloat), s"got $got")
    // non-square image, fractional cell mean: 4×2 gradient → cells
    // (lumas 0,17 | 35,53 | 22,22 | 22,22) → means 8.5, 44, 22, 22
    val grad = Ppm.decode(gradientPpm).get
    val g2 = Ppm.lumaGrid(grad, 2).toSeq
    val n2 = math.sqrt(8.5 * 8.5 + 44.0 * 44.0 + 484.0 + 484.0)
    assert(g2 == Seq(8.5f, 44f, 22f, 22f).map(v =>
      (v.toDouble / n2).toFloat), s"got $g2")
    // all-black normalizes to the zero vector, not NaN
    val black = Ppm.lumaGrid(Ppm.Image(2, 2, new Array[Byte](12)), 2).toSeq
    assert(black == Seq(0f, 0f, 0f, 0f))
  }

  // A 4x2 P6 image with known pixels: top row red shades, bottom blue
  private def gradientPpm: Array[Byte] = {
    val rgb = new Array[Byte](4 * 2 * 3)
    for (x <- 0 until 4) {
      rgb(x * 3) = (x * 60).toByte                   // top: R = 0,60,120,180
      rgb((4 + x) * 3 + 2) = 200.toByte              // bottom: B = 200
    }
    Ppm.encode(Ppm.Image(4, 2, rgb))
  }

  test("PPM codec: decode is exact and corrupt input is None") {
    val img = Ppm.decode(gradientPpm).get
    assert(img.width == 4 && img.height == 2)
    assert((img.rgb(3) & 0xff) == 60)          // pixel (1,0) red channel
    assert((img.rgb((4 + 2) * 3 + 2) & 0xff) == 200) // pixel (2,1) blue
    // header with comment parses; truncated raster and garbage do not
    val withComment = ("P6\n# a comment\n4 2\n255\n").getBytes("US-ASCII") ++
      Ppm.decode(gradientPpm).get.rgb
    assert(Ppm.decode(withComment).exists(_.width == 4))
    assert(Ppm.decode(gradientPpm.dropRight(5)).isEmpty)
    assert(Ppm.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.sniffMime(gradientPpm) == Multimodal.PpmMime)
  }

  test("real image decode: header dims and pixel-derived features") {
    val df = Seq((1L, gradientPpm), (2L, wav)).toDF("id", "bin")
      .repartition(2)
    val media = Multimodal.asMediaTable(df, "id", "bin")
    val rows = Multimodal.decodeImages(media).orderBy("media_id").collect()
    val ppmRow = rows(0)
    assert(ppmRow.getAs[Int]("img_width") == 4)
    assert(ppmRow.getAs[Int]("img_height") == 2)
    val f = ppmRow.getAs[scala.collection.Seq[Float]]("img_features")
    // meanR = (0+60+120+180)/8 = 45; meanG = 0; meanB = 200*4/8 = 100
    assert(f(0) == 45f && f(1) == 0f && f(2) == 100f)
    // top-left quadrant luminance: pixels (0,0),(1,0): (0 + 60*299/1000)/2
    assert(math.abs(f(3) - (0f + (60 * 299 / 1000)) / 2f) < 0.01f)
    // non-image row: nulls, not an error
    assert(rows(1).isNullAt(rows(1).fieldIndex("img_width")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("img_features")))
  }

  test("real PPM resize: transcoded bytes decode to expected pixels") {
    val df = Seq((1L, gradientPpm), (2L, wav)).toDF("id", "bin")
    val media = Multimodal.asMediaTable(df, "id", "bin")
    val resized = Multimodal.resizePpm(media, 2, 1).orderBy("media_id").collect()
    val out = Ppm.decode(resized(0).getAs[Array[Byte]]("content")).get
    assert(out.width == 2 && out.height == 1)
    // nearest-neighbor: (0,0)<-src(0,0) R=0; (1,0)<-src(2,0) R=120
    assert((out.rgb(0) & 0xff) == 0)
    assert((out.rgb(3) & 0xff) == 120)
    val meta = resized(0).getStruct(resized(0).fieldIndex("meta"))
    assert(meta.getAs[Int]("width") == 2 && meta.getAs[Int]("height") == 1)
    // non-PPM content passes through untouched
    assert(resized(1).getAs[Array[Byte]]("content").sameElements(wav))
  }

  test("WAV codec: PCM roundtrip, real duration, signal features") {
    // 1 kHz of samples: first half a +/-16384 square wave, second half silence
    val samples = Array.tabulate[Short](1000) { i =>
      if (i >= 500) 0
      else if ((i / 10) % 2 == 0) 16384.toShort else (-16384).toShort
    }
    val blob = Wav.encode(Wav.Audio(1000, 1, samples))
    assert(Multimodal.sniffMime(blob) == "audio/wav")
    val a = Wav.decode(blob).get
    assert(a.sampleRate == 1000 && a.channels == 1)
    assert(a.durationMs == 1000L)       // real, from the header+data
    assert(a.samples.toSeq == samples.toSeq)
    val f = Wav.features(a)
    // RMS: square wave at 0.5 amplitude over half the signal → sqrt(0.125)
    assert(math.abs(f(0) - math.sqrt(0.125).toFloat) < 1e-4)
    assert(f(2) > 0.49f && f(3) > 0.49f) // first two windows active
    assert(f(5) == 0f)                   // last window silent
    assert(Wav.decode(blob.dropRight(7)).isEmpty)       // truncated
    assert(Wav.decode(Array[Byte](1, 2, 3, 4)).isEmpty) // garbage
  }

  test("real audio decode over a media table") {
    val tone = Wav.encode(Wav.Audio(8000, 2,
      Array.tabulate[Short](1600)(i => (i % 256).toShort)))
    val df = Seq((1L, tone), (2L, gradientPpm)).toDF("id", "bin")
      .repartition(2)
    val rows = Multimodal.decodeAudio(
      Multimodal.asMediaTable(df, "id", "bin")).orderBy("media_id").collect()
    assert(rows(0).getAs[Int]("sample_rate") == 8000)
    assert(rows(0).getAs[Int]("n_channels") == 2)
    assert(rows(0).getAs[Long]("audio_ms") == 100L) // 1600/(8000*2) s
    assert(rows(0).getAs[scala.collection.Seq[Float]]("audio_features")
      .length == 6)
    assert(rows(1).isNullAt(rows(1).fieldIndex("sample_rate"))) // image row
  }

  // 2x2 C444 video, 3 frames at 10 fps with luma 50/100/150
  private def tinyY4m: Array[Byte] = {
    val frames = IndexedSeq(50, 100, 150).map { luma =>
      Array.fill[Byte](2 * 2 * 3)(luma.toByte) // Y,U,V planes all = luma
    }
    Y4m.encode(Y4m.Video(2, 2, 10, 1, "444", frames))
  }

  test("Y4M codec: header, demux, luma; corrupt input is None") {
    assert(Multimodal.sniffMime(tinyY4m) == Multimodal.Y4mMime)
    val v = Y4m.decode(tinyY4m).get
    assert(v.width == 2 && v.height == 2 && v.frameCount == 3)
    assert(v.durationMs == 300L) // 3 frames at 10 fps
    assert(Y4m.meanLuma(v, 0) == 50.0 && Y4m.meanLuma(v, 2) == 150.0)
    assert(Y4m.decode(tinyY4m.dropRight(3)).isEmpty) // truncated frame
    assert(Y4m.decode("YUV4MPEG2 W0 H2 F10:1\n".getBytes).isEmpty)
    assert(Y4m.decode(Array[Byte](9, 9)).isEmpty)
  }

  test("real video frame sampling emits decodable PPM frames") {
    val df = Seq((1L, tinyY4m), (2L, wav)).toDF("id", "bin")
    val media = Multimodal.asMediaTable(df, "id", "bin")
    val frames = Multimodal.sampleVideoFrames(media, stride = 2)
      .orderBy("frame_no").collect()
    assert(frames.length == 2) // frames 0 and 2; non-video row emits none
    assert(frames.map(_.getAs[Int]("frame_no")).toSeq == Seq(0, 2))
    assert(frames.map(_.getAs[Long]("offset_ms")).toSeq == Seq(0L, 200L))
    assert(frames.map(_.getAs[Double]("mean_luma")).toSeq == Seq(50.0, 150.0))
    // the video→image bridge: sampled frame decodes as a real PPM
    val img = Ppm.decode(frames(1).getAs[Array[Byte]]("frame_ppm")).get
    assert(img.width == 2 && img.height == 2)
    assert((img.rgb(0) & 0xff) == 150) // grayscale = luma
  }

  test("hostile headers return None, never throw (overflow guards)") {
    // WAV chunk length near Int.MaxValue would wrap the bounds check
    val evilWav = ("RIFF" + " " * 4 + "WAVE" + "fmt ").getBytes("ISO-8859-1") ++
      Array[Byte](0xf0.toByte, 0xff.toByte, 0xff.toByte, 0x7f.toByte) ++
      new Array[Byte](32)
    assert(Wav.decode(evilWav).isEmpty)
    // Y4M dims whose product overflows Int
    val evilY4m = "YUV4MPEG2 W26755 H26755 F10:1 C444\nFRAME\n".getBytes ++
      new Array[Byte](64)
    assert(Y4m.decode(evilY4m).isEmpty)
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

  test("quick metadata is a real header parse per format") {
    val bmp = Bmp.encode(Ppm.Image(3, 2, new Array[Byte](3 * 2 * 3)))
    val realWav = Wav.encode(Wav.Audio(8000, 1, Array.fill[Short](1000)(7)))
    val df = Seq(
      (1L, gradientPpm), (2L, bmp), (3L, tinyY4m), (4L, realWav),
      (5L, png), (6L, jpg)).toDF("id", "bin")
    val meta = Multimodal.asMediaTable(df, "id", "bin")
      .select(col("media_id"), col("meta.*")).orderBy("media_id").collect()
    // PPM: "P6\n4 2\n255" header
    assert(meta(0).getAs[Int]("width") == 4 &&
      meta(0).getAs[Int]("height") == 2)
    // BMP: LE32 dims from BITMAPINFOHEADER
    assert(meta(1).getAs[Int]("width") == 3 &&
      meta(1).getAs[Int]("height") == 2)
    // Y4M: "W2 H2" header tokens; duration needs a frame scan → null
    assert(meta(2).getAs[Int]("width") == 2 &&
      meta(2).getAs[Int]("height") == 2)
    assert(meta(2).isNullAt(meta(2).fieldIndex("duration_ms")))
    // WAV: 2000 data bytes at 16000 B/s = 125 ms; dims are null
    assert(meta(3).getAs[Long]("duration_ms") == 125L)
    assert(meta(3).isNullAt(meta(3).fieldIndex("width")))
    // truncated magic-byte stubs: mime sniffs, dims stay null (no
    // hash-derived placeholders), never an error
    assert(meta(4).getAs[String]("mime") == "image/png")
    assert(meta(4).isNullAt(meta(4).fieldIndex("width")))
    assert(meta(5).getAs[String]("mime") == "image/jpeg")
    assert(meta(5).isNullAt(meta(5).fieldIndex("width")))
  }

  test("hostile headers yield null metadata, never an ANSI cast crash") {
    // commented PNM header (codec grammar, not the quick regex),
    // bare 2-byte magic, truncated Y4M tag, OS/2 BITMAPCOREHEADER
    // (16-bit dims at the INFOHEADER offsets — must not misread)
    val coreBmp = "BM".getBytes("ISO-8859-1") ++ new Array[Byte](12) ++
      Array[Byte](12, 0, 0, 0, 3, 0, 2, 0, 1, 0, 24, 0) ++
      new Array[Byte](16)
    val df = Seq(
      (1L, "P6\n# comment\n4 2\n255\n".getBytes ++ new Array[Byte](24)),
      (2L, "P6".getBytes),
      (3L, "YUV4MPEG2".getBytes),
      (4L, coreBmp)).toDF("id", "bin")
    val meta = Multimodal.asMediaTable(df, "id", "bin")
      .select(col("media_id"), col("meta.*")).orderBy("media_id").collect()
    meta.foreach { m =>
      assert(m.isNullAt(m.fieldIndex("width")), s"row $m")
      assert(m.isNullAt(m.fieldIndex("height")), s"row $m")
    }
  }

  test("transcodePng: lossless PPM→PNG rewrite, pass-through for non-images") {
    val df = Seq((1L, gradientPpm), (2L, wav)).toDF("id", "bin")
    val media = Multimodal.asMediaTable(df, "id", "bin")
    val rows = Multimodal.transcodePng(media).orderBy("media_id").collect()
    val png = rows(0).getAs[Array[Byte]]("content")
    val meta = rows(0).getStruct(rows(0).fieldIndex("meta"))
    assert(meta.getString(0) == "image/png")
    assert(meta.getLong(1) == png.length.toLong)
    assert(meta.getInt(2) == 4 && meta.getInt(3) == 2)
    // lossless: the PNG decodes back to the original PPM pixels
    assert(ImageCodec.decode(png).get.rgb.toSeq ==
      Ppm.decode(gradientPpm).get.rgb.toSeq)
    // non-image content and metadata pass through untouched
    assert(rows(1).getAs[Array[Byte]]("content").toSeq == wav.toSeq)
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
