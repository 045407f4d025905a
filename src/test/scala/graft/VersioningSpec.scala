package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Pins the round-5 corpus-management operators on hand fixtures:
  * snapshot diff statuses, per-domain caps, and preference-pair
  * construction (chosen/rejected selection + margin). */
class VersioningSpec extends SparkSpec {
  import spark.implicits._

  test("corpusDiff classifies added/removed/changed/unchanged") {
    val old = Seq((1L, "same"), (2L, "will change"), (3L, "will vanish"))
      .toDF("doc_id", "text")
    val nw = Seq((1L, "same"), (2L, "changed!"), (4L, "brand new"))
      .toDF("doc_id", "text")
    val got = TextOps.corpusDiff(old, nw)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("domainCap keeps at most cap docs per domain, longest first") {
    val docs = Seq(
      (1L, "a.com", 100L), (2L, "a.com", 300L), (3L, "a.com", 200L),
      (4L, "b.org", 50L))
      .toDF("doc_id", "source", "n_chars")
    val got = TextOps.domainCap(docs, col("source"), cap = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(got.toSet == Set(
      ("a.com", 2L, 1, 3L), ("a.com", 3L, 2, 3L), ("b.org", 4L, 1, 1L)))
  }

  test("domainCap ties break to the lower doc_id") {
    val docs = Seq((7L, "x", 10L), (5L, "x", 10L), (9L, "x", 10L))
      .toDF("doc_id", "source", "n_chars")
    val got = TextOps.domainCap(docs, col("source"), cap = 2)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((5L, 1), (7L, 2)))
  }

  test("preferencePairs picks extreme-diversity docs with an exact margin") {
    // scores (distinct/total · 1e6, floored):
    //   d1 "a a a a" -> 250000; d2 "a b c d" -> 1000000; d3 "a a b b" -> 500000
    val docs = Seq(
      (1L, "en", "web", "a a a a"),
      (2L, "en", "web", "a b c d"),
      (3L, "en", "web", "a a b b"),
      (4L, "fr", "web", "solo doc"))
      .toDF("doc_id", "lang", "source", "text")
    val got = TextOps.preferencePairs(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // the singleton (fr, web) group emits nothing
    assert(got.toSeq == Seq(("en", "web", 2L, 1L, 750000L)))
  }

  test("preferencePairs never self-pairs even when every score ties") {
    // both docs score 1_000_000: top ties to the lower id, bot to the higher
    val docs = Seq(
      (1L, "en", "s", "a b"), (2L, "en", "s", "c d"))
      .toDF("doc_id", "lang", "source", "text")
    val got = TextOps.preferencePairs(docs).collect()
    assert(got.length == 1)
    assert(got.head.getLong(2) == 1L && got.head.getLong(3) == 2L)
    assert(got.head.getLong(4) == 0L)
  }
}
