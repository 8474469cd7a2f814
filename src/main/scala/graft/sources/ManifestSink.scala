package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 WRITE path — a manifest-committing sink built on the
  * two-phase commit protocol Spark gives custom sinks:
  *
  *   1. every task writes its file under a hidden `.tmp-` name and
  *      RENAMES it into place only in `DataWriter.commit()` — an
  *      aborted/zombie task's output is never visible;
  *   2. each commit message carries (file, rows, XOR row digest);
  *   3. the driver's `BatchWrite.commit` writes `manifest.json`
  *      (file list + totals) via temp+rename — readers that trust
  *      only manifest-listed files get exactly-once semantics even
  *      over retried tasks, and the embedded q225-style digest makes
  *      the sink self-verifying end to end.
  *
  * This is the engine seam for bespoke export formats at 100 TB: the
  * protocol (not the row encoding — simple `|`-joined text here)
  * is the point. Gated by q233: the manifest totals written through
  * the full task/driver commit chain must equal the DuckDB-side
  * aggregate of the same payload.
  *
  * Usage: `df.write.format("graft.sources.ManifestSink")
  * .option("path", dir).mode("overwrite").save()`.
  */
class ManifestSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ManifestSink.AnySchema
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ManifestTable(properties.get("path"), schema)
}

object ManifestSink {
  /** Placeholder for inferSchema; real writes carry the df schema. */
  private[sources] val AnySchema = StructType(Nil)

  /** The exact [[graft.dedup.Md5Prefix]] arithmetic in plain JVM form
    * (first 15 hex chars of md5 as a long) so the manifest digest is
    * DuckDB-replayable: `('0x'||substr(md5(x),1,15))::BIGINT`. */
  def rowHash(payload: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
}

private[sources] class ManifestTable(path: String, schema0: StructType)
  extends Table with SupportsWrite {
  override def name(): String = s"graft_manifest($path)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ManifestWriteBuilder(path, info.schema())
}

private[sources] class ManifestWriteBuilder(path: String,
                                            schema: StructType)
  extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder = this // overwrite = rewrite all
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new ManifestBatchWrite(path, schema)
  }
}

private[sources] case class FileReport(file: String, rows: Long,
                                       digest: Long)
  extends WriterCommitMessage

private[sources] class ManifestBatchWrite(path: String,
                                          schema: StructType)
  extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = new SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active
        .sparkContext.hadoopConfiguration)
    new ManifestWriterFactory(path, schema, conf)
  }

  /** Driver-side job commit: the manifest IS the commit record —
    * written to a temp name and renamed, so readers either see the
    * complete file list or nothing. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val reports = messages.map(_.asInstanceOf[FileReport]).sortBy(_.file)
    val fs = new Path(path).getFileSystem(
      org.apache.spark.sql.SparkSession.active
        .sparkContext.hadoopConfiguration)
    val files = reports.map(r =>
      s"""{"file":"${r.file}","rows":${r.rows},"digest":${r.digest}}""")
    val totalDigest = reports.map(_.digest)
      .foldLeft(0L)(_ ^ _)
    val body =
      s"""{"n_files":${reports.length},""" +
        s""""total_rows":${reports.map(_.rows).sum},""" +
        s""""total_digest":$totalDigest,""" +
        s""""files":[${files.mkString(",")}]}"""
    val tmp = new Path(path, ".manifest.json.tmp")
    val out = fs.create(tmp, true)
    out.write(body.getBytes("UTF-8")); out.close()
    val target = new Path(path, "manifest.json")
    fs.delete(target, false)
    if (!fs.rename(tmp, target))
      sys.error(s"manifest sink: could not commit manifest at $target")
  }

  /** Driver-side job abort: committed task files are rolled back so
    * a failed job leaves no unmanifested data behind. */
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(
      org.apache.spark.sql.SparkSession.active
        .sparkContext.hadoopConfiguration)
    messages.collect { case FileReport(f, _, _) =>
      fs.delete(new Path(path, f), false)
    }
  }
}

private[sources] class ManifestWriterFactory(
    path: String, schema: StructType, conf: SerializableConfiguration)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new ManifestWriter(path, schema, conf, partitionId, taskId)
}

/** Task-side writer: rows land in `.tmp-…`; only task COMMIT renames
  * the file into place and reports it upward. Abort deletes the temp
  * — a speculative duplicate or failed attempt is invisible. */
private[sources] class ManifestWriter(
    path: String, schema: StructType, conf: SerializableConfiguration,
    partitionId: Int, taskId: Long)
  extends DataWriter[InternalRow] {

  private val fileName = f"part-$partitionId%05d.txt"
  private val tmp = new Path(path, s".tmp-$fileName-$taskId")
  private val fs = tmp.getFileSystem(conf.value)
  private val out = fs.create(tmp, true)
  private var rows = 0L
  private var digest = 0L

  override def write(record: InternalRow): Unit = {
    val payload = schema.fields.zipWithIndex.map { case (f, i) =>
      f.dataType match {
        case LongType => record.getLong(i).toString
        case IntegerType => record.getInt(i).toString
        case StringType => record.getUTF8String(i).toString
        case dt => record.get(i, dt).toString
      }
    }.mkString("|")
    out.write((payload + "\n").getBytes("UTF-8"))
    rows += 1L
    digest ^= ManifestSink.rowHash(payload)
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    val target = new Path(path, fileName)
    fs.delete(target, false) // retried task: last commit wins
    if (!fs.rename(tmp, target))
      sys.error(s"manifest sink: could not commit $tmp")
    FileReport(fileName, rows, digest)
  }

  override def abort(): Unit = { out.close(); fs.delete(tmp, false) }
  override def close(): Unit = ()
}
