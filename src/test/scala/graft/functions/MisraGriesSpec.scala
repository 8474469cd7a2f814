package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The sketch's contract, checked off-Spark on the raw Aggregator:
  * NO FALSE NEGATIVES at any split of the stream into partial buffers
  * — the property q133's oracle-pinned `captured = TRUE` column hangs
  * on. (The Spark-side laziness and one-scan plan are pinned in
  * PlanAuditSpec; DuckDB checks the end-to-end rows.) */
class MisraGriesSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(7L + i)))

  /** Run the stream through the aggregator with the given partition
    * layout: reduce within partitions, merge across — exactly Spark's
    * partial-aggregation shape. */
  private def run(mg: MisraGries,
                  parts: Seq[Seq[(String, Long)]]): Set[String] =
    parts.map(_.foldLeft(mg.zero)(mg.reduce))
      .foldLeft(mg.zero)(mg.merge).keySet

  test("no false negatives under any partitioning (property)") {
    val genStream = for {
      nKeys <- Gen.choose(1, 12)
      len <- Gen.choose(1, 200)
      items <- Gen.listOfN(len, for {
        k <- Gen.choose(0, nKeys - 1)
        w <- Gen.choose(1L, 20L)
      } yield (s"k$k", w))
      nParts <- Gen.choose(1, 5)
    } yield (items, nParts)

    for (((items, nParts), i) <- sample(genStream, 200).zipWithIndex) {
      val k = 4
      val mg = new MisraGries(k)
      val total = items.map(_._2).sum
      val exact = items.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      val heavy = exact.collect {
        case (t, w) if w * (k + 1) > total => t
      }.toSet
      // deterministic round-robin split — a "any partitioning" sample
      val parts = items.zipWithIndex.groupMap(_._2 % nParts)(_._1)
        .values.toSeq
      val got = run(mg, parts)
      assert(heavy.subsetOf(got),
        s"case $i: dropped heavy hitter(s) ${heavy -- got}; " +
          s"stream=$items parts=$nParts")
      assert(got.size <= k, s"case $i: summary exceeded k counters")
    }
  }

  test("weighted updates equal unit-weight replay") {
    val mg = new MisraGries(3)
    val weighted = Seq("a" -> 5L, "b" -> 2L, "a" -> 1L, "c" -> 4L)
    val units = weighted.flatMap { case (t, w) =>
      Seq.fill(w.toInt)(t -> 1L)
    }
    assert(mg.finish(weighted.foldLeft(mg.zero)(mg.reduce)).toSeq ==
      mg.finish(units.foldLeft(mg.zero)(mg.reduce)).toSeq)
  }

  test("non-positive weights are ignored; shrink keeps at most k") {
    val mg = new MisraGries(2)
    val b = Seq("a" -> 3L, "b" -> 0L, "c" -> -1L)
      .foldLeft(mg.zero)(mg.reduce)
    assert(b == Map("a" -> 3L))
    val full = Seq("a" -> 3L, "b" -> 2L, "c" -> 1L)
      .foldLeft(mg.zero)(mg.reduce)
    // c arrives into a full buffer: subtract the 3rd-largest (1) —
    // c cancels itself, the survivors each lose 1
    assert(full == Map("a" -> 2L, "b" -> 1L))
  }
}
