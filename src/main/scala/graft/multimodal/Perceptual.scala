package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Perceptual image hashing — dHash (difference hash): REAL image
  * near-duplicate detection over decoded pixels, the visual analog of
  * the text MinHash/SimHash family. Two renderings of the same image
  * (recompressed, slightly filtered) keep almost identical adjacent-
  * pixel luminance gradients, so their dHashes differ in few bits;
  * Hamming distance over the hash is the visual-similarity metric.
  *
  * The candidate join reuses the banded-Hamming idea from SimHash
  * ([[graft.dedup.Dedup]]): 8 bands × 7 bits — by pigeonhole, any
  * pair within Hamming ≤ 7 agrees on at least one whole band, so the
  * band-equality self-join is LOSSLESS for the ≤ 7 threshold and the
  * oracle can be the brute-force all-pairs spelling.
  */
object Perceptual {

  /** 56-bit dHash of a decoded image: integer luma
    * (299·R + 587·G + 114·B)/1000 — the same luma as [[Ppm.features]]
    * — then one bit per horizontally adjacent pixel pair, set when the
    * left pixel is darker (bit index r·(w−1)+c from the MSB end).
    * Deterministic integer math end to end, so DuckDB replays it
    * bit-exactly. Requires bits = h·(w−1) ≤ 63. */
  def dhash(img: Ppm.Image): Long = {
    val w = img.width
    val bits = img.height * (w - 1)
    require(bits > 0 && bits <= 63, s"dhash needs h*(w-1) in [1,63], " +
      s"got ${img.height}x$w")
    def gray(p: Int): Int = {
      val i = p * 3
      (299 * (img.rgb(i) & 0xff) + 587 * (img.rgb(i + 1) & 0xff) +
        114 * (img.rgb(i + 2) & 0xff)) / 1000
    }
    var h = 0L
    var i = 0
    while (i < bits) {
      val r = i / (w - 1); val c = i % (w - 1)
      if (gray(r * w + c) < gray(r * w + c + 1))
        h |= 1L << (bits - 1 - i)
      i += 1
    }
    h
  }

  /** (doc_id, dhash) over the rendered media corpus — the decode runs
    * the real PPM codec per partition (same mapPartitions shape as
    * [[Multimodal.decodeImages]]); undecodable blobs are dropped. */
  def dhashes(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.renderedBlobs(s, dir)
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    val rdd = media.rdd.mapPartitions { it =>
      it.flatMap { r =>
        Ppm.decode(r.getAs[Array[Byte]]("blob"))
          .map(img => Row(r.getLong(0), dhash(img)))
      }
    }
    s.createDataFrame(rdd, outSchema)
  }

  /** q122: image near-dup pairs — every pair of rendered images within
    * Hamming ≤ `maxHamming` of each other's dHash.
    *
    * Scale shape: candidates come from ONE band-equality self-join (8
    * shuffle-partitioned bucket keys per image, id-only payload), the
    * exact Hamming filter runs map-side on the candidate pairs via
    * `bit_count(xor)`, and the banding is lossless for the threshold
    * (8 bands, ≤ 7 differing bits ⇒ ≥ 1 band equal) — so the DuckDB
    * oracle is the brute-force all-pairs spelling and the bucket
    * optimization must be invisible in the result. A boilerplate
    * corpus concentrating one band value inherits the SimHash
    * star+chain cap discussion (Dedup.scala); at this threshold the
    * exact filter keeps precision 1 regardless. */
  def imageNearDup(s: SparkSession, dir: String,
                   maxHamming: Int = 7): DataFrame =
    bandedHammingPairs(dhashes(s, dir), maxHamming)

  /** The shared candidate machinery for every 56-bit perceptual hash
    * (image dHash, audio energy-contour hash): band-equality self-join
    * over 8×7-bit bands, exact map-side `bit_count(xor)` filter —
    * lossless for `maxHamming` ≤ 7 by pigeonhole. Input: (doc_id,
    * dhash). */
  def bandedHammingPairs(dh: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 7,
      "8 bands over 56 bits guarantee recall only for hamming <= 7")
    val bands = dh.select(col("doc_id"), col("dhash"),
        explode(sequence(lit(0), lit(7))).as("band"))
      .withColumn("bval",
        expr("shiftright(dhash, band * 7)").bitwiseAND(lit(0x7fL)))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a"), col("a.dhash").as("ha"),
        col("b.doc_id").as("b"), col("b.dhash").as("hb"))
      .distinct()
    cand
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("int"))
      .where(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
      .orderBy("a", "b")
  }

  /** 56-bit audio energy-contour hash of decoded PCM samples: frame
    * energies (64 frames × 4 samples, Σ s² as exact Long) and one bit
    * per adjacent frame pair, set when energy rises. GAIN-INVARIANT:
    * scaling every sample scales every frame energy by the same
    * factor, so the comparisons — and the hash — are unchanged (the
    * property a loudness-normalized re-encode of the same clip needs).
    * Requires ≥ 256 samples; integer math end to end. */
  def ahash(a: Wav.Audio): Long = {
    require(a.samples.length >= 256, "ahash needs at least 256 samples")
    val e = new Array[Long](64)
    var f = 0
    while (f < 64) {
      var acc = 0L
      var j = 0
      while (j < 4) {
        val s = a.samples(4 * f + j).toLong
        acc += s * s
        j += 1
      }
      e(f) = acc
      f += 1
    }
    var h = 0L
    var i = 0
    while (i < 56) {
      if (e(i) < e(i + 1)) h |= 1L << (55 - i)
      i += 1
    }
    h
  }

  /** (doc_id, dhash) audio hashes over a rendered WAV corpus: each
    * document's bytes become 256 centered 16-bit PCM samples, encoded
    * to a real RIFF blob and decoded back through the [[Wav]] codec —
    * the audio leg of the same render→real-decode→hash pipeline as
    * [[dhashes]]. */
  def ahashes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blobs = graft.Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val bytes = Option(text).getOrElse("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val samples = Array.tabulate[Short](256) { i =>
          if (bytes.isEmpty) 0
          else (((bytes(i % bytes.length) & 0xff) - 128) * 256).toShort
        }
        (id, Wav.encode(Wav.Audio(8000, 1, samples)))
      }.toDF("doc_id", "blob")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    val rdd = blobs.rdd.mapPartitions { it =>
      it.flatMap { r =>
        Wav.decode(r.getAs[Array[Byte]]("blob"))
          .map(a => Row(r.getLong(0), ahash(a)))
      }
    }
    s.createDataFrame(rdd, outSchema)
  }

  /** q124: audio near-dup pairs — same lossless banded-Hamming shape
    * as q122, over the energy-contour hash of REAL decoded PCM. */
  def audioNearDup(s: SparkSession, dir: String,
                   maxHamming: Int = 7): DataFrame =
    bandedHammingPairs(ahashes(s, dir), maxHamming)

  /** (doc_id, fhash) DISTINCT per-frame dHashes of a rendered 4-frame
    * mono Y4M corpus: frame j's 8×8 luma plane tiles the document
    * bytes starting at offset 16·j (frames overlap — consecutive
    * frames of one "clip" share content, like real video); the blob
    * round-trips the REAL [[Y4m]] codec and each frame converts via
    * [[Y4m.frameAsPpm]] (luma replicated to RGB, so the integer gray
    * (299+587+114)·y/1000 = y exactly and the frame dHash IS the luma
    * dHash — DuckDB replays it without channel math). */
  def fhashes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blobs = graft.Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val bytes = Option(text).getOrElse("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val frames = (0 until 4).map { j =>
          if (bytes.isEmpty) new Array[Byte](64)
          else Array.tabulate[Byte](64)(i =>
            bytes((i + 16 * j) % bytes.length))
        }
        (id, Y4m.encode(Y4m.Video(8, 8, 25, 1, "mono", frames)))
      }.toDF("doc_id", "blob")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("fhash", LongType, nullable = false)))
    val rdd = blobs.rdd.mapPartitions { it =>
      it.flatMap { r =>
        Y4m.decode(r.getAs[Array[Byte]]("blob")).toSeq.flatMap { v =>
          (0 until v.frameCount).map(f =>
            Row(r.getLong(0), dhash(Y4m.frameAsPpm(v, f))))
        }
      }
    }
    s.createDataFrame(rdd, outSchema).distinct()
  }

  /** q125: video near-dup — pairs of clips sharing at least
    * `minShared` distinct per-frame fingerprints: the standard
    * keyframe-fingerprint-set approach. The 64-bit frame-hash
    * equality join IS the blocking (no banding, no approximation);
    * the shared count per pair is one exact aggregate. */
  def videoNearDup(s: SparkSession, dir: String,
                   minShared: Int = 2): DataFrame = {
    val fh = fhashes(s, dir)
    fh.as("a").join(fh.as("b"),
        col("a.fhash") === col("b.fhash") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
      .agg(count(lit(1)).as("shared_frames"))
      .where(col("shared_frames") >= minShared)
      .orderBy("a", "b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q122_image_neardup" -> ((s: SparkSession, d: String) =>
      imageNearDup(s, d)),
    "q124_audio_neardup" -> ((s: SparkSession, d: String) =>
      audioNearDup(s, d)),
    "q125_video_neardup" -> ((s: SparkSession, d: String) =>
      videoNearDup(s, d)))

  /** Brute force on purpose (banding is lossless at the threshold);
    * the raster/luma/bit math replays the REAL decode pipeline the
    * Spark side runs on PPM bytes — same rendering spelling as q70. */
  val oracle: Map[String, String] = Map(
    "q122_image_neardup" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(coalesce(text, ''))) AS h,
        |    octet_length(encode(coalesce(text, ''))) AS n
        |  FROM documents),
        |raster AS (
        |  SELECT doc_id,
        |    CASE WHEN n = 0 THEN [0 for i in range(0, 192)]
        |         ELSE [('0x' || substr(h, 2 * (i % n) + 1, 2))::INT
        |               for i in range(0, 192)] END AS px
        |  FROM b),
        |gray AS (
        |  SELECT doc_id,
        |    [(299 * px[3*p + 1] + 587 * px[3*p + 2]
        |      + 114 * px[3*p + 3]) // 1000
        |     for p in range(0, 64)] AS g
        |  FROM raster),
        |dh AS (
        |  SELECT doc_id,
        |    CAST(list_sum([CASE WHEN g[(i // 7) * 8 + (i % 7) + 1]
        |                        < g[(i // 7) * 8 + (i % 7) + 2]
        |                   THEN (CAST(1 AS BIGINT) << (55 - i))
        |                   ELSE 0 END
        |                   for i in range(0, 56)]) AS BIGINT) AS dhash
        |  FROM gray)
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |  CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
        |FROM dh a JOIN dh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.dhash, b.dhash)) <= 7
        |ORDER BY a, b""".stripMargin,
    "q124_audio_neardup" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(coalesce(text, ''))) AS h,
        |    octet_length(encode(coalesce(text, ''))) AS n
        |  FROM documents),
        |samp AS (
        |  SELECT doc_id,
        |    CASE WHEN n = 0 THEN [0 for i in range(0, 256)]
        |         ELSE [(('0x' || substr(h, 2 * (i % n) + 1, 2))::BIGINT
        |                - 128) * 256
        |               for i in range(0, 256)] END AS s
        |  FROM b),
        |energy AS (
        |  SELECT doc_id,
        |    [s[4*f + 1]*s[4*f + 1] + s[4*f + 2]*s[4*f + 2]
        |     + s[4*f + 3]*s[4*f + 3] + s[4*f + 4]*s[4*f + 4]
        |     for f in range(0, 64)] AS e
        |  FROM samp),
        |ah AS (
        |  SELECT doc_id,
        |    CAST(list_sum([CASE WHEN e[f + 1] < e[f + 2]
        |                   THEN (CAST(1 AS BIGINT) << (55 - f))
        |                   ELSE 0 END
        |                   for f in range(0, 56)]) AS BIGINT) AS dhash
        |  FROM energy)
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |  CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
        |FROM ah a JOIN ah b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.dhash, b.dhash)) <= 7
        |ORDER BY a, b""".stripMargin,
    "q125_video_neardup" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(coalesce(text, ''))) AS h,
        |    octet_length(encode(coalesce(text, ''))) AS n
        |  FROM documents),
        |frames AS (
        |  SELECT doc_id, h, n, unnest([0, 1, 2, 3]) AS j
        |  FROM b),
        |luma AS (
        |  SELECT doc_id, j,
        |    CASE WHEN n = 0 THEN [0 for i in range(0, 64)]
        |         ELSE [('0x' || substr(h, 2 * ((i + 16 * j) % n) + 1,
        |                2))::INT
        |               for i in range(0, 64)] END AS g
        |  FROM frames),
        |fh AS (
        |  SELECT doc_id, j,
        |    CAST(list_sum([CASE WHEN g[(i // 7) * 8 + (i % 7) + 1]
        |                        < g[(i // 7) * 8 + (i % 7) + 2]
        |                   THEN (CAST(1 AS BIGINT) << (55 - i))
        |                   ELSE 0 END
        |                   for i in range(0, 56)]) AS BIGINT) AS fhash
        |  FROM luma),
        |df AS (SELECT DISTINCT doc_id, fhash FROM fh)
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |  CAST(count(*) AS BIGINT) AS shared_frames
        |FROM df a JOIN df b
        |  ON a.fhash = b.fhash AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY a, b""".stripMargin)
}
