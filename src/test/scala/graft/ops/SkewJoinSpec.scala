package graft.ops

import org.apache.spark.sql.DataFrame

import graft.{SparkSpec, Tables}

/** The entire contract of salting: identical answers to the plain
  * join, for inner AND left (unmatched-preserving) semantics. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = Tables.load(spark, sf(), "lineitem")
    .select("l_partkey", "l_quantity")
  private lazy val part = Tables.load(spark, sf(), "part")
    .select($"p_partkey".as("l_partkey"), $"p_brand")

  private def rows(df: DataFrame): Map[Seq[Any], Long] =
    df.collect().map(_.toSeq).groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }

  test("salted inner join equals the plain inner join (multiset)") {
    val plain = li.join(part, Seq("l_partkey"))
    val salted = SkewJoin.saltedEquiJoin(li, part, Seq("l_partkey"), salt = 7)
    assert(rows(salted) == rows(plain))
  }

  test("salted left join preserves unmatched left rows exactly once") {
    // a fact row with a key absent from the dim: must survive as ONE
    // null-extended row, not salt copies
    val facts = li.limit(10).union(
      Seq((-1L, 99.0)).toDF("l_partkey", "l_quantity"))
    val plain = facts.join(part, Seq("l_partkey"), "left")
    val salted = SkewJoin.saltedEquiJoin(facts, part, Seq("l_partkey"),
      salt = 5, joinType = "left")
    assert(rows(salted) == rows(plain))
    assert(salted.where($"l_partkey" === -1L).count() == 1)
  }

  test("right-preserved join types are rejected") {
    intercept[IllegalArgumentException] {
      SkewJoin.saltedEquiJoin(li, part, Seq("l_partkey"), joinType = "right")
    }
  }
}
