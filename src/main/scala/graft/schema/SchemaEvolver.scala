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
    * (parquet rewrite / catalog ALTER) and may log `ddl`.
    *
    * The reconciliation DECISION (merged schema, added columns,
    * create-vs-alter) is always computed here — deterministic and
    * non-negotiable; only the DDL TEXT is delegated to `gen`
    * ([[DdlGenerator]]), mirroring the reference's LLM-or-fallback
    * split where the fallback fixes the semantics. */
  def evolve(existing: Option[StructType], inferred: StructType,
             table: TableName = TableName(None, "t"),
             dialect: Dialect = Postgres,
             gen: DdlGenerator = DdlGenerator.Deterministic)
      : EvolutionResult = {
    val sanitizedInferred = StructType(inferred.fields.map(f =>
      f.copy(name = TypeLattice.sanitize(f.name))).toSeq)
    existing match {
      case None =>
        EvolutionResult(
          merged = sanitizedInferred,
          addedColumns = sanitizedInferred.fields.toSeq,
          createdTable = true,
          ddl = gen.createTable(table, sanitizedInferred, dialect))
      case Some(cur) =>
        val have = cur.fields.map(_.name.toLowerCase).toSet
        val added = sanitizedInferred.fields.toSeq
          .filterNot(f => have.contains(f.name.toLowerCase))
        EvolutionResult(
          merged = StructType(cur.fields.toSeq ++ added),
          addedColumns = added,
          createdTable = false,
          ddl = gen.alterTable(table, added, dialect))
    }
  }

  /** Multi-statement split on ';' dropping empties (reference
    * agent-schema/app.py:226-231). */
  def splitStatements(sql: String): Seq[String] =
    sql.split(";").iterator.map(_.trim).filter(_.nonEmpty).toSeq
}
