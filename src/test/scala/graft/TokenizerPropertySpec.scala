package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{TextOps, Tokenizer}

/** Property-based cross-check of the round's trickiest algebra against
  * straight-line driver references:
  *
  *   - BPE: the distributed merge is window algebra (run-grouping +
  *     even-offset selection); the reference is the textbook sequential
  *     fold. They must agree on random corpora — including the overlap
  *     runs ("aaaa") and tie-breaks the windows exist to get right.
  *   - Packing: conservation and exact-fill capacity over random docs at
  *     random partition counts.
  *
  * Seeded generators for deterministic runs (RulesPropertySpec
  * convention). */
class TokenizerPropertySpec extends SparkSpec {
  import spark.implicits._

  // small alphabet on purpose: repeated chars maximize overlapping-run
  // and tie-break cases
  private val genWord: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val genCorpus: Gen[List[String]] = for {
    nDocs <- Gen.choose(1, 8)
    docs <- Gen.listOfN(nDocs, Gen.choose(1, 12).flatMap(k =>
      Gen.listOfN(k, genWord).map(_.mkString(" "))))
  } yield docs

  /** Textbook BPE on the driver: sequential greedy leftmost merge. */
  private def refBpe(texts: Seq[String], rounds: Int): Map[String, (Long, String)] = {
    val counts = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    var syms: Map[String, Vector[String]] =
      counts.map { case (w, _) => w -> w.map(_.toString).toVector }
    for (_ <- 1 to rounds) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (w, ss) =>
        ss.zip(ss.drop(1)).foreach(p => pairCounts(p) = pairCounts.getOrElse(p, 0L) + counts(w)) }
      if (pairCounts.nonEmpty) {
        val (s1, s2) = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        syms = syms.map { case (w, ss) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < ss.length) {
            if (i + 1 < ss.length && ss(i) == s1 && ss(i + 1) == s2) {
              out += s1 + s2; i += 2
            } else { out += ss(i); i += 1 }
          }
          w -> out.toVector
        }
      }
    }
    counts.map { case (w, c) => w -> ((c, syms(w).mkString(" "))) }
  }

  test("property: distributed BPE equals the sequential-fold reference on random corpora") {
    val gen = for { c <- genCorpus; r <- Gen.choose(0, 4) } yield (c, r)
    (1 to 12).foreach { i =>
      val (texts, rounds) = gen.apply(Gen.Parameters.default, Seed(4200L + i)).get
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
      val got = Tokenizer.bpeTrain(docs, rounds)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
      val want = refBpe(texts, rounds)
      assert(got == want,
        s"seed ${4200 + i}: rounds=$rounds corpus=$texts\n got=$got\nwant=$want")
    }
  }

  test("property: packing conserves tokens and fills every window except the last") {
    val gen = for {
      n <- Gen.choose(1, 25)
      lens <- Gen.listOfN(n, Gen.choose(0, 40))
      ctx <- Gen.oneOf(8, 16, 64)
      parts <- Gen.choose(1, 6)
    } yield (lens, ctx, parts)
    (1 to 12).foreach { i =>
      val (lens, ctx, parts) = gen.apply(Gen.Parameters.default, Seed(9900L + i)).get
      val docs = lens.zipWithIndex
        .map { case (l, j) => (j.toLong, Seq.fill(l)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val packed = TextOps.packSequences(docs, ctx, partitions = parts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      // note: an empty text still tokenizes to [""], so need = 2
      val needs = lens.zipWithIndex
        .map { case (l, j) => j.toLong -> (if (l == 0) 2L else l + 1L) }.toMap
      val byDoc = packed.groupBy(_._1).map { case (d, rs) => d -> rs.map(_._3).sum }
      assert(byDoc == needs, s"seed ${9900 + i}: conservation failed")
      val total = needs.values.sum
      val byChunk = packed.groupBy(_._2).map { case (c, rs) => c -> rs.map(_._3).sum }
      val last = (total - 1) / ctx
      byChunk.foreach { case (c, fill) =>
        if (c == last) assert(fill == total - last * ctx)
        else assert(fill == ctx, s"seed ${9900 + i}: window $c fill $fill != $ctx")
      }
    }
  }
}
