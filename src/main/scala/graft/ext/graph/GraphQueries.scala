package graft.ext.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.dedup.DedupQueries

/**
 * Graph analytics over the near-duplicate pair graph: PageRank centrality.
 * Complements the connected-components collapse (`dedup_clusters`) — where
 * components tell you WHICH docs form a duplication cluster, PageRank tells
 * you which doc is the cluster's hub (the canonical/most-copied text, a
 * better survivor choice than min-id for boilerplate-heavy corpora).
 *
 * Determinism: ranks are exact integers in micro-units with explicitly
 * floored divisions — contrib = r ⌊/⌋ deg, r' = (0.15·SCALE +
 * 0.85·Σ contrib) ⌊/⌋ 1 — identical in both engines (all operands
 * non-negative), so the DuckDB oracle unrolls the SAME [[Iters]]
 * iterations and hash-matches every rank.
 *
 * Scale shape: per iteration one join of the edge list against the
 * (node-sized) rank frame and one aggregate on the destination key — the
 * standard iterative-propagation plan, the same family as the component
 * loop. The edge list materializes ONCE (localCheckpoint) from the shared
 * jaccard posting-list pipeline; iterations never re-run the text
 * pipeline. At 100 TB: edges hash-partition on source; rank state is one
 * row per node; hub skew (a node with millions of in-edges) is an
 * aggregation-skew case for the salted-sum helper, not a join blow-up.
 */
object GraphQueries {

  val Scale = 1000000L
  /** Fixed iteration count, like the k-means trainer: a pure function of
    * the input is what the oracle/determinism gates require. Three rounds
    * on a near-dup graph (tiny diameters) is already near fixpoint. */
  val Iters = 3

  def qPagerank(spark: SparkSession, dir: String): DataFrame = {
    val pairs = DedupQueries.jaccardPairSnapshot(spark, dir).select(col("doc_a"), col("doc_b"))
    val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .unionByName(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .localCheckpoint() // iterate over the edge list, not the text pipeline
    val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("d"))
    var ranks = deg.select(col("u"), lit(Scale).as("r"))
    for (_ <- 1 to Iters) {
      ranks = edges
        .join(ranks, "u").join(deg, "u")
        .select(col("v"), expr("r DIV d").as("c"))
        .groupBy(col("v"))
        .agg(sum(col("c")).as("s"))
        .select(col("v").as("u"),
          expr(s"(15 * $Scale + 85 * s) DIV 100").as("r"))
    }
    // every node of the undirected pair graph has in-degree ≥ 1, so the
    // final join is total — no rank row is ever lost to a dangling node
    ranks.join(deg, "u")
      .select(col("u").as("doc_id"), col("r").as("rank_micro"), col("d").as("degree"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (qPagerank _))

  /** One unrolled iteration — the same floored-integer update as the
    * Spark side. DuckDB `sum(BIGINT)` widens to HUGEINT, which would
    * otherwise propagate through `//` into `rank_micro` and break the hash
    * gate; CAST the sum back to BIGINT per the repo-wide oracle discipline
    * (cf. the kmeans oracle). */
  private def iterSql(n: Int): String =
    s"""r$n AS (
       |  SELECT e.v AS u,
       |    CAST((15 * $Scale + 85 * CAST(sum(p.r // deg.d) AS BIGINT)) // 100 AS BIGINT) AS r
       |  FROM edges e
       |  JOIN r${n - 1} p ON p.u = e.u
       |  JOIN deg ON deg.u = e.u
       |  GROUP BY 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "graph_pagerank" ->
      s"""WITH pairs AS (
         |  SELECT doc_a, doc_b FROM (
         |${DedupQueries.ngramJaccardSql}
         |  ) jp),
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |deg AS (SELECT u, count(*) AS d FROM edges GROUP BY 1),
         |r0 AS (SELECT u, CAST($Scale AS BIGINT) AS r FROM deg),
         |${(1 to Iters).map(iterSql).mkString(",\n")}
         |SELECT r$Iters.u AS doc_id, r$Iters.r AS rank_micro, deg.d AS degree
         |FROM r$Iters JOIN deg ON deg.u = r$Iters.u""".stripMargin)
}
