package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** Pins the fixed-point PageRank trajectory on hand-computed graphs —
  * the exact micro-unit ranks after each floor-divide/floor-damp round,
  * plus the co-occurrence edge builder's symmetry/distinctness. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) =
    pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")

  test("uniform graph is a fixed point: triangle ranks stay 1_000_000") {
    val got = Graph.pagerank(edges((1L, 2L), (2L, 3L), (1L, 3L)), rounds = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> ((1000000L, 2L)), 2L -> ((1000000L, 2L)), 3L -> ((1000000L, 2L))))
  }

  test("path graph 1-2-3: hand-computed ranks after 2 rounds") {
    // r1: ends 575_000, middle 1_850_000
    // r2: ends 150000+floor(.85*925000)=936_250, middle 150000+floor(.85*1150000)=1_127_500
    val got = Graph.pagerank(edges((1L, 2L), (2L, 3L)), rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 936250L, 2L -> 1127500L, 3L -> 936250L))
  }

  test("co-occurrence edges are symmetric, distinct, and loop-free") {
    val df = Seq((10L, 1L), (10L, 2L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 4L))
      .toDF("g", "id")
    val e = Graph.coOccurrenceEdges(df, "g", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e == Set((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L), (3L, 2L),
      (1L, 4L), (4L, 1L)))
  }

  test("fixture co-purchase graph: every node keeps degree and a positive rank") {
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val out = Graph.pagerank(
      Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey"), rounds = 2)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) >= 150000L, s"rank below damping floor: $r")
      assert(r.getLong(2) >= 1L)
    }
  }
}
