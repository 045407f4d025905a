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

  test("timeTravel replays a hand-built log: last action wins, deletes drop, later versions resurrect") {
    // shard 1: put@0, delete@2, put@4 (resurrected)
    // shard 2: put@0, put@3 (rewritten)
    // shard 3: put@1, delete@5
    val log = Seq(
      (0L, 1L, "put", Some(11L)), (2L, 1L, "delete", None), (4L, 1L, "put", Some(14L)),
      (0L, 2L, "put", Some(20L)), (3L, 2L, "put", Some(23L)),
      (1L, 3L, "put", Some(31L)), (5L, 3L, "delete", None))
      .toDF("version", "shard_id", "action", "file_hash")
    val got = TextOps.timeTravel(log, Seq(0L, 2L, 3L, 5L))(spark)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (0L, 1L) -> 11L, (0L, 2L) -> 20L,
      (2L, 2L) -> 20L, (2L, 3L) -> 31L,
      (3L, 2L) -> 23L, (3L, 3L) -> 31L,
      (5L, 1L) -> 14L, (5L, 2L) -> 23L))
  }

  test("q176 face: as-of-5 state differs from as-of-2 only through logged actions; version 0 is the full manifest") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val log = TextOps.commitLog(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val snaps = TextOps.timeTravel(TextOps.commitLog(docs), Seq(0L, 2L, 5L))(spark)
      .collect().groupBy(_.getLong(0))
      .map { case (v, rs) => v -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    // as-of 0 = every shard at its base hash
    val base = log.filter(_._1 == 0L).map(t => t._2 -> t._4.get).toMap
    assert(snaps(0L) == base)
    // driver replay oracle for any version
    def replay(v: Long): Map[Long, Long] =
      log.filter(_._1 <= v).groupBy(_._2).flatMap { case (sid, acts) =>
        val last = acts.maxBy(_._1)
        if (last._3 == "put") Some(sid -> last._4.get) else None
      }
    assert(snaps(2L) == replay(2L))
    assert(snaps(5L) == replay(5L))
    assert(snaps(5L) != snaps(2L), "versions 3-5 must change something at this SF")
  }

  test("q240: parent differs iff some child differs, and level-0 diffs are exactly the touched buckets") {
    val rows = TextOps.q240MerkleDiff.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.getString(2)), Option(r.getString(3)), r.getBoolean(4))).toMap
    // the anti-entropy invariant: a sync descending only through
    // differing nodes reaches every changed leaf and skips every
    // certified-identical subtree
    for (level <- Seq(1L, 2L); (k, v) <- rows if k._1 == level) {
      val kids = rows.filter { case ((l, b), _) => l == level - 1 && b / 16 == k._2 }
      assert(kids.nonEmpty)
      assert(v._3 == kids.values.exists(_._3),
        s"level-$level bucket ${k._2}: differs must equal OR over children")
    }
    // level-0 differing buckets = exactly the id ranges touched by the
    // synthesized edit/delete/add pattern
    val ids = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val touched = (ids.filter(id => id % 23 == 0 || (id % 17 == 0)).map(_ / 16) ++
      ids.filter(_ % 19 == 0).map(id => (id + 3000000L) / 16)).toSet
    val diff0 = rows.collect { case ((0L, b), (_, _, true)) => b }.toSet
    assert(diff0 == touched, "level-0 differs set must equal the touched bucket set")
    assert(rows.exists { case ((l, _), v) => l == 2L && v._3 },
      "the synthesized changes must surface at the top level")
    // the one-sided outer branch: added docs create v2-only buckets
    assert(rows.exists { case ((0L, _), (v1h, _, d)) => v1h.isEmpty && d })
  }
}
