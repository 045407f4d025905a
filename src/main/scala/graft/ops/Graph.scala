package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.sources.Tables

/** Iterative graph analytics over relational edge sets — PageRank (Page
  * et al. 1999) as the representative fixed-round random-walk operator.
  * Link-graph scores are a first-class curation signal for web-scale
  * training corpora (OPT/CCNet-style crawls rank hosts by centrality;
  * "page quality by link authority" predates model-based filters), and
  * the same join-agg round template serves personalized PageRank and
  * label propagation.
  *
  * Every quantity is FIXED-POINT INTEGER: ranks are micro-units
  * (10⁶ = 1.0), per-edge contributions floor-divide by degree, and the
  * damping blend floors 0.85·incoming — so the whole trajectory is an
  * exact integer sequence, identical in Spark and DuckDB regardless of
  * aggregation order (the q119/q132 unrolled-trajectory device applied
  * to graph iteration; floats would diverge across engines under
  * reordered sums).
  *
  * Scale posture (100 TB): the edge relation is built ONCE (one
  * self-join shuffle keyed on the common attribute + a distinct) and
  * persisted partitioned by src; each round is one src-keyed broadcast-
  * or-shuffle join of the node-sized rank relation against the pinned
  * edges + one dst-keyed map-side-combined sum — the rank relation
  * (nodes, not edges) is all that moves between rounds. Rounds are a
  * fixed small constant (PageRank converges geometrically; production
  * runs 10–20). Dangling mass: the co-purchase graph is symmetric by
  * construction so every node has out-degree ≥ 1; a directed-graph
  * variant would add the standard dangling-sum redistribution term.
  */
object Graph {
  import QueryDef.sql

  /** Micro-unit scale: rank 1.0 ≡ 1,000,000. */
  val RankScale = 1000000L

  /** One-hop co-occurrence edges of `df`: distinct (src, dst) pairs of
    * `idCol` values sharing a `groupCol` value, src ≠ dst. Symmetric by
    * construction. */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, idCol: String): DataFrame = {
    val a = df.select(col(groupCol).as("g"), col(idCol).as("src")).distinct()
    val b = df.select(col(groupCol).as("g"), col(idCol).as("dst")).distinct()
    a.join(b, Seq("g")).filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
  }

  /** `rounds` fixed-point PageRank iterations over a (src, dst) edge
    * relation; returns (part, rank, degree) for every node. Damping
    * 0.85 in micro-units: rank' = 150000 + floor(0.85 · Σ floor(rank/deg)). */
  def pagerank(edges: DataFrame, rounds: Int): DataFrame = {
    val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var rank = deg.select(col("src").as("part"), lit(RankScale).as("rank"))
    for (_ <- 1 to rounds) {
      val contrib = rank
        .join(deg, rank("part") === deg("src"))
        .withColumn("c", expr("CAST(FLOOR(CAST(rank AS DOUBLE) / d) AS BIGINT)"))
        .join(e, Seq("src"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inc"))
      rank = deg.select(col("src").as("part"))
        .join(contrib, col("part") === contrib("dst"), "left")
        .select(col("part"),
          (lit(150000L) + expr(
            "CAST(FLOOR(0.85D * CAST(COALESCE(inc, CAST(0 AS BIGINT)) AS DOUBLE)) AS BIGINT)")).as("rank"))
    }
    rank.join(deg, rank("part") === deg("src"))
      .select(col("part"), col("rank"), col("d").as("degree"))
  }

  /** One unrolled oracle round k over CTEs e/deg/r{k-1}. */
  private def roundSql(k: Int): String = {
    val prev = s"r${k - 1}"
    s"""c$k AS (SELECT e.dst, CAST(FLOOR(CAST(r.rank AS DOUBLE) / deg.d) AS BIGINT) AS c
       |  FROM $prev r JOIN deg ON deg.src = r.part JOIN e ON e.src = r.part),
       |s$k AS (SELECT dst, CAST(SUM(c) AS BIGINT) AS inc FROM c$k GROUP BY 1),
       |r$k AS (SELECT n.part,
       |    150000 + CAST(FLOOR(0.85 * CAST(COALESCE(s.inc, 0) AS DOUBLE)) AS BIGINT) AS rank
       |  FROM r0 n LEFT JOIN s$k s ON s.dst = n.part)""".stripMargin
  }

  /** Contract face of [[pagerank]]: 3 rounds over the co-purchase part
    * graph (parts sharing an order), top 100 by authority. The final
    * ranks hash the whole trajectory — any round's floor-divide
    * diverging anywhere reshuffles the leaderboard. */
  val q143Pagerank: QueryDef = sql(
    "q143_pagerank",
    s"""WITH e AS (
       |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |  FROM lineitem a JOIN lineitem b
       |    ON b.l_orderkey = a.l_orderkey AND b.l_partkey <> a.l_partkey),
       |deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),
       |r0 AS (SELECT src AS part, CAST($RankScale AS BIGINT) AS rank FROM deg),
       |${roundSql(1)},
       |${roundSql(2)},
       |${roundSql(3)}
       |SELECT r.part, r.rank, deg.d AS degree
       |FROM r3 r JOIN deg ON deg.src = r.part
       |ORDER BY r.rank DESC, r.part
       |LIMIT 100""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    pagerank(coOccurrenceEdges(li, "l_orderkey", "l_partkey"), rounds = 3)
      .orderBy(col("rank").desc, col("part"))
      .limit(100)
  }

  val all: Seq[QueryDef] = Seq(q143Pagerank)
}
