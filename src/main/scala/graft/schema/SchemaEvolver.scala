package graft.schema

import org.apache.spark.sql.types._
import TypeLattice.{Dialect, Postgres}

/** Additive-only schema evolution with the reference's reconciliation
  * contract (reference agent-schema/app.py:104-114, implemented here as
  * the deterministic fallback path of app.py:204-218 — the LLM is an
  * unreliable external dependency; the fallback defines the semantics):
  *
  *   - create schema / table when missing;
  *   - ADD only columns the table lacks — never drop, never rename,
  *     never change an existing column's type;
  *   - column-name comparison is case-insensitive (app.py:107);
  *   - identifiers are sanitized (`-`/space → `_`, app.py:110);
  *   - `schema.table` is split on the FIRST dot (app.py:190-193).
  */
object SchemaEvolver {

  /** One evolution decision, with its warehouse-DDL equivalent. */
  final case class EvolutionResult(
      merged: StructType,
      addedColumns: Seq[StructField],
      createdTable: Boolean,
      ddl: Seq[String])

  final case class TableName(schema: Option[String], table: String) {
    def qualified: String = schema.fold(table)(s => s"$s.$table")
  }

  /** Split on the first '.' only — `a.b.c` → schema `a`, table `b.c`
    * (reference app.py:190-193 uses `split(".", 1)`). */
  def parseTableName(raw: String): TableName = {
    val sanitized = TypeLattice.sanitize(raw)
    sanitized.split("\\.", 2) match {
      case Array(s, t) => TableName(Some(s), t)
      case Array(t)    => TableName(None, t)
    }
  }

  /** Reconcile an inferred schema against the existing table schema
    * (None = table absent). Pure function: the caller applies `merged`
    * (parquet rewrite / catalog ALTER) and may log `ddl`. */
  def evolve(existing: Option[StructType], inferred: StructType,
             table: TableName = TableName(None, "t"),
             dialect: Dialect = Postgres): EvolutionResult = {
    val sanitizedInferred = StructType(inferred.fields.map(f =>
      f.copy(name = TypeLattice.sanitize(f.name))).toSeq)
    existing match {
      case None =>
        EvolutionResult(
          merged = sanitizedInferred,
          addedColumns = sanitizedInferred.fields.toSeq,
          createdTable = true,
          ddl = createDdl(table, sanitizedInferred, dialect))
      case Some(cur) =>
        val have = cur.fields.map(_.name.toLowerCase).toSet
        val added = sanitizedInferred.fields.toSeq
          .filterNot(f => have.contains(f.name.toLowerCase))
        EvolutionResult(
          merged = StructType(cur.fields.toSeq ++ added),
          addedColumns = added,
          createdTable = false,
          ddl = added.map(f =>
            s"ALTER TABLE ${table.qualified} ADD COLUMN ${f.name} " +
              TypeLattice.sqlType(f.dataType, dialect) + ";"))
    }
  }

  private def createDdl(table: TableName, schema: StructType,
                        dialect: Dialect): Seq[String] = {
    val cols = schema.fields
      .map(f => s"  ${f.name} ${TypeLattice.sqlType(f.dataType, dialect)}")
      .mkString(",\n")
    val createNs = table.schema.map { ns =>
      dialect match {
        case Postgres => s"CREATE SCHEMA IF NOT EXISTS $ns;"
        case _        => s"CREATE DATABASE IF NOT EXISTS $ns;"
      }
    }
    createNs.toSeq :+
      s"CREATE TABLE IF NOT EXISTS ${table.qualified} (\n$cols\n);"
  }

  /** Multi-statement split on ';' dropping empties (reference
    * agent-schema/app.py:226-231). */
  def splitStatements(sql: String): Seq[String] =
    sql.split(";").iterator.map(_.trim).filter(_.nonEmpty).toSeq
}
