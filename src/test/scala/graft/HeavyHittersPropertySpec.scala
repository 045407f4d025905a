package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.HeavyHitters

/** Property-based Misra-Gries invariants over random token streams and
  * random PARTITIONINGS of those streams — exercising reduce and merge
  * directly (no Spark), where the adversarial cases live: skewed
  * vocabularies, many partitions, tiny partitions. Seeded generators for
  * deterministic runs (same convention as RulesPropertySpec). */
class HeavyHittersPropertySpec extends SparkSpec {

  /** Zipf-ish stream: small hot vocabulary + long random tail. */
  private val genStream: Gen[List[String]] = for {
    n <- Gen.choose(200, 2000)
    toks <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.oneOf("w0", "w1", "w2", "w3"),
      3 -> Gen.choose(0, 40).map(i => s"mid$i"),
      1 -> Gen.choose(0, 100000).map(i => s"tail$i")))
  } yield toks

  private val genCuts: Gen[List[Int]] =
    Gen.listOfN(7, Gen.choose(0, 1999))

  private def sketchOf(parts: Seq[Seq[String]]): Map[String, Long] =
    parts
      .map(p => p.foldLeft(HeavyHitters.zero)(HeavyHitters.reduce))
      .foldLeft(HeavyHitters.zero)(HeavyHitters.merge)

  test("MG guarantees hold for any stream under any partitioning") {
    val cases = (1 to 25).flatMap { i =>
      for {
        stream <- genStream.apply(Gen.Parameters.default, Seed(i.toLong))
        cuts <- genCuts.apply(Gen.Parameters.default, Seed(i.toLong + 1000))
      } yield (stream, cuts)
    }
    assert(cases.size >= 20, "generators should produce most samples")
    cases.foreach { case (stream, cuts) =>
      val n = stream.length.toLong
      val exact = stream.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
      // split the stream at the (sorted, deduped, in-range) cut points
      val bounds = (cuts.map(c => c % (stream.length + 1)).sorted.distinct
        :+ stream.length).distinct.sorted
      val parts = (0 +: bounds).distinct.sorted.sliding(2).collect {
        case Seq(a, b) if b >= a => stream.slice(a, b)
      }.toSeq
      assert(parts.map(_.length).sum == stream.length, "partitioning must cover the stream")

      val sk = sketchOf(parts)
      val bound = n / (HeavyHitters.K + 1)
      assert(sk.size <= HeavyHitters.K)
      sk.foreach { case (w, est) =>
        val t = exact.getOrElse(w, 0L)
        assert(est <= t, s"overcount: '$w' est=$est true=$t")
        assert(t - est <= bound, s"undercount: '$w' est=$est true=$t bound=$bound")
      }
      exact.filter(_._2 > bound).keys.foreach { w =>
        assert(sk.contains(w), s"guaranteed heavy hitter '$w' missing (n=$n)")
      }

      // single-partition sketch obeys the same envelope (reduce-only path)
      val single = sketchOf(Seq(stream))
      single.foreach { case (w, est) =>
        assert(est <= exact(w) && exact(w) - est <= bound)
      }
    }
  }
}
