package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** KMV's hash-gate-bearing property, checked off-Spark on the raw
  * Aggregator: the finished sketch is a PURE FUNCTION of the input
  * SET — invariant under row order, duplication, and ANY partition /
  * merge-tree layout (exactly Spark's partial-aggregation freedom).
  * q178/q183's bit-exact DuckDB comparison rests on this. */
class KmvSketchSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(41L + i)))

  private def reference(k: Int, xs: Seq[Long]): Seq[Long] =
    xs.distinct.sorted.take(k)

  test("any partitioning + merge order yields the k smallest distinct (property)") {
    val genCase = for {
      k <- Gen.choose(2, 32)
      len <- Gen.choose(0, 300)
      xs <- Gen.listOfN(len, Gen.choose(0L, 400L)) // dense → duplicates
      nParts <- Gen.choose(1, 8)
      seed <- Gen.choose(0L, 1000L)
    } yield (k, xs, nParts, seed)
    sample(genCase, 200).foreach { case (k, xs, nParts, seed) =>
      val sk = new KmvSketch(k)
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(xs)
      val parts = (0 until nParts)
        .map(p => shuffled.zipWithIndex.collect {
          case (x, i) if i % nParts == p => x
        })
      val partials = rnd.shuffle(parts.map(_.foldLeft(sk.zero)(sk.reduce)))
      val merged = partials.foldLeft(sk.zero)(sk.merge)
      assert(merged.toSeq == reference(k, xs),
        s"k=$k parts=$nParts seed=$seed: ${merged.toSeq} " +
          s"!= ${reference(k, xs)}")
    }
  }

  test("merge is idempotent and commutative on arbitrary sketches") {
    val genXs = Gen.listOfN(80, Gen.choose(0L, 200L))
    sample(Gen.zip(genXs, genXs), 100).foreach { case (a, b) =>
      val sk = new KmvSketch(16)
      val sa = a.foldLeft(sk.zero)(sk.reduce)
      val sb = b.foldLeft(sk.zero)(sk.reduce)
      assert(sk.merge(sa, sb).toSeq == sk.merge(sb, sa).toSeq)
      assert(sk.merge(sa, sa).toSeq == sa.toSeq)
      assert(sk.merge(sa, sk.zero).toSeq == sa.toSeq)
    }
  }
}
