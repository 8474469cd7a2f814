package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

import graft.schema.{SchemaEvolver, SchemaInference, TypeLattice}
import graft.schema.SchemaEvolver.{EvolutionResult, TableName}

/** CSV → typed zone table: the Spark collapse of the reference's
  * agent + NiFi + warehouse-load path (SURVEY.md §3.1; reference
  * dags/pipeline_orchestrator.py:98-123, agent-schema/app.py:167-243).
  *
  * One driver program replaces three services:
  *   1. infer schema from a 100-row sample (O(1) in file size),
  *   2. additively evolve the existing target schema,
  *   3. full single-pass read with the explicit merged schema,
  *   4. align columns (missing → typed nulls) and overwrite-write
  *      parquet — distributed, no driver-side row movement.
  */
object CsvIngest {

  final case class IngestResult(
      table: TableName,
      evolution: EvolutionResult,
      rowsSampled: Int,
      path: String)

  /** Ingest `csvPath` into `<zoneRoot>/<schema>/<table>.parquet`. */
  def ingest(spark: SparkSession, csvPath: String, tableName: String,
             zoneRoot: String,
             sampleRows: Int = SchemaInference.DefaultSampleRows,
             dialect: TypeLattice.Dialect = TypeLattice.Postgres,
             ddlGen: graft.schema.DdlGenerator =
               graft.schema.DdlGenerator.Deterministic)
      : IngestResult = {
    val table = SchemaEvolver.parseTableName(tableName)
    val target = targetPath(zoneRoot, table)

    val sampled = SchemaInference.inferCsvSample(spark, csvPath, sampleRows)
    val existing = readExistingSchema(spark, target)
    val evo = SchemaEvolver.evolve(existing, sampled.schema, table, dialect,
      ddlGen)

    // Full read: header-named all-string read, then cast BY NAME to the
    // merged types. An explicit schema on a CSV read is applied
    // positionally (the header is ignored under enforceSchema), so a
    // file whose column order differs from the table's would silently
    // misassign values across columns — casting by name is order-proof.
    val byLower = evo.merged.fields.map(f => f.name.toLowerCase -> f).toMap
    val strings = spark.read.option("header", "true").csv(csvPath)
    val raw = strings.select(strings.columns.toSeq.map { c =>
      val name = TypeLattice.sanitize(c)
      byLower.get(name.toLowerCase) match {
        // try_cast: values that drifted after the inference sample
        // become NULL (the reference's sample-typed behavior), instead
        // of failing the whole load under ANSI cast semantics
        case Some(f) => col(s"`$c`").try_cast(f.dataType).as(f.name)
        case None    => col(s"`$c`").as(name)
      }
    }: _*)

    // Align to the merged schema: columns the file lacks become typed
    // nulls (additive evolution never loses existing columns).
    val aligned = evo.merged.fields.foldLeft(raw) { (df, f) =>
      if (df.columns.map(_.toLowerCase).contains(f.name.toLowerCase)) df
      else df.withColumn(f.name, lit(null).cast(f.dataType))
    }.select(evo.merged.fieldNames.map(col).toIndexedSeq: _*)

    // APPEND, not overwrite: the reference's ingest path loads rows
    // INTO the raw table (NiFi → JDBC INSERT, SURVEY.md §2.1 S2) —
    // full-refresh (M1) belongs to the transform step
    // (Pipeline.materialize), not ingest. Files written before an
    // evolution are narrower; zone reads use mergeSchema (see
    // readZoneTable) so old rows surface the added columns as NULL —
    // additive evolution without rewriting 100 TB of history.
    aligned.write.mode(SaveMode.Append).parquet(target)

    // the sample count comes from the inference read — no extra job
    IngestResult(table, evo, sampled.rowsSampled, target)
  }

  def targetPath(zoneRoot: String, table: TableName): String =
    table.schema.fold(s"$zoneRoot/${table.table}.parquet")(s =>
      s"$zoneRoot/$s/${table.table}.parquet")

  /** Read a zone table under the union of all file schemas (pre- and
    * post-evolution files coexist; added columns are NULL in old rows). */
  def readZoneTable(spark: SparkSession, zoneRoot: String,
                    tableName: String): DataFrame =
    spark.read.option("mergeSchema", "true")
      .parquet(targetPath(zoneRoot, SchemaEvolver.parseTableName(tableName)))

  /** Schema of the existing zone table, or None only when the table
    * genuinely does not exist yet. Only path-absence means 'new table';
    * any other failure propagates — treating a transient read error as
    * 'new' would append a file typed without the historically evolved
    * columns and misreport the evolution DDL for that run. */
  private def readExistingSchema(spark: SparkSession,
                                 path: String): Option[StructType] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      Some(spark.read.option("mergeSchema", "true").parquet(path).schema)
    else None
  }
}
