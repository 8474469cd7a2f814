package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{split, trim}

/** Shared whitespace tokenizer for the text/dedup/array operators.
  *
  * One definition on purpose: every oracle-checked query's DuckDB side
  * spells this as `string_split_regex(trim(text), '\s+')`, so the
  * Spark side must tokenize identically everywhere — a drifted copy in
  * one module would silently break cross-engine comparison for just
  * that module's queries.
  */
object Tokens {
  def whitespace(c: Column): Column = split(trim(c), "\\s+")
}
