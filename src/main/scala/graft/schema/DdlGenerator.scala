package graft.schema

import org.apache.spark.sql.types.{StructField, StructType}
import TypeLattice.{Dialect, Postgres}
import SchemaEvolver.TableName

/** The DDL-authoring seam (reference agent-schema/app.py:78-153 vs
  * 204-218): the reference lets an LLM author the warehouse DDL when
  * available and falls back to deterministic text otherwise — the
  * RECONCILIATION decision (which columns to add, create vs alter,
  * never drop/rename/retype) is fixed either way. This trait is that
  * split made explicit: [[SchemaEvolver.evolve]] computes the decision
  * and delegates only the DDL text to the generator, so an LLM-backed
  * implementation drops in without touching evolution semantics — and
  * without this repo taking any network dependency (the deterministic
  * default is the only implementation shipped, matching the
  * fallback-defines-the-contract stance of SURVEY §2.10).
  */
trait DdlGenerator {

  /** Author DDL for creating `table` with `schema` (including any
    * schema/database namespace creation the dialect needs). */
  def createTable(table: TableName, schema: StructType,
                  dialect: Dialect = Postgres): Seq[String]

  /** Author DDL for additively extending `table` by `added`. */
  def alterTable(table: TableName, added: Seq[StructField],
                 dialect: Dialect = Postgres): Seq[String]
}

object DdlGenerator {

  /** The reference's fallback path (app.py:204-218), verbatim
    * semantics: CREATE SCHEMA/DATABASE IF NOT EXISTS for the
    * namespace, CREATE TABLE IF NOT EXISTS with one column per line,
    * ALTER TABLE ADD COLUMN per added column. Executable SQL — the
    * Derby round-trip in WarehouseSpec runs DDL in this family. */
  object Deterministic extends DdlGenerator {

    override def createTable(table: TableName, schema: StructType,
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

    override def alterTable(table: TableName, added: Seq[StructField],
                            dialect: Dialect): Seq[String] =
      added.map(f =>
        s"ALTER TABLE ${table.qualified} ADD COLUMN ${f.name} " +
          TypeLattice.sqlType(f.dataType, dialect) + ";")
  }
}
