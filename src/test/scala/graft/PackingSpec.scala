package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Pins the invariants of cross-document sequence packing (q130):
  * conservation (every token lands in exactly one window), capacity
  * (every window is exactly full except the last), and partition-count
  * independence of the two-pass prefix sum — the property that makes
  * the distributed layout trustworthy: offsets must not depend on where
  * the range partitioner happened to place its boundaries. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val L = 16

  private def docsOf(texts: Seq[(Long, String)]) =
    texts.toDF("doc_id", "text")

  // 1 EOS per doc: need = tokens + 1
  private val fixture = docsOf(Seq(
    1L -> "a b c d e f g",              // 8
    2L -> "h i j",                      // 4
    3L -> ("t " * 30).trim,             // 31 — straddles several windows
    5L -> "",                           // empty text still costs 2 (token "" + EOS)
    8L -> "x y z w v u t s r q p o n m" // 15
  ))

  test("conservation: per-doc window contributions sum to tokens + EOS") {
    val packed = TextOps.packSequences(fixture, L)
    val byDoc = packed.groupBy("doc_id").agg(sum("n_tok").as("got"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Map(1L -> 8L, 2L -> 4L, 3L -> 31L, 5L -> 2L, 8L -> 15L)
    assert(byDoc == expected)
  }

  test("capacity: every window holds exactly L tokens except the last") {
    val packed = TextOps.packSequences(fixture, L)
    val byChunk = packed.groupBy("chunk_id").agg(sum("n_tok").as("fill"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = 8L + 4 + 31 + 2 + 15
    val lastChunk = (total - 1) / L
    byChunk.foreach { case (cid, fill) =>
      if (cid == lastChunk) assert(fill == total - lastChunk * L)
      else assert(fill == L, s"window $cid holds $fill, expected $L")
    }
    assert(byChunk.keySet == (0L to lastChunk).toSet)
  }

  test("offsets are contiguous in doc_id order (start = running sum of need)") {
    val packed = TextOps.packSequences(fixture, L)
    val starts = packed.select("doc_id", "start").distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(starts == Map(1L -> 0L, 2L -> 8L, 3L -> 12L, 5L -> 43L, 8L -> 45L))
  }

  test("two-pass prefix sum is partition-count independent") {
    val ref = TextOps.packSequences(fixture, L, partitions = 1)
      .orderBy("doc_id", "chunk_id").collect().toSeq
    Seq(3, 8).foreach { p =>
      val got = TextOps.packSequences(fixture, L, partitions = p)
        .orderBy("doc_id", "chunk_id").collect().toSeq
      assert(got == ref, s"packing differs at $p partitions")
    }
  }

  test("fixture run: window ids are dense and a straddling doc spans adjacent windows") {
    val packed = TextOps.packSequences(
      graft.sources.Tables.documents(spark, sfDir), 128)
    val rows = packed.orderBy("doc_id", "chunk_id").collect()
    assert(rows.nonEmpty)
    // a doc's windows are consecutive ints
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val cids = rs.map(_.getLong(1)).sorted
      assert(cids.zip(cids.tail).forall { case (a, b) => b == a + 1 })
    }
  }
}
