package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.dedup.DedupQueries
import graft.ext.graph.GraphQueries

/** PageRank invariants over the near-dup pair graph. */
class GraphSpec extends SparkSpec {

  test("graph_pagerank: mass conservation, node coverage, hub signal") {
    val out = GraphQueries.qPagerank(spark, sf).cache()
    val pairs = DedupQueries.qNgramJaccard(spark, sf)
    val nodes = pairs.select(col("doc_a").as("d"))
      .unionByName(pairs.select(col("doc_b").as("d"))).distinct().count()
    assert(out.count() == nodes, "one rank per node of the pair graph")

    // total rank stays near n·SCALE: the update redistributes mass, the
    // floored divisions only ever lose fractions (bounded per node/iter)
    val total = out.agg(sum("rank_micro")).head().getLong(0)
    assert(total <= nodes * GraphQueries.Scale)
    assert(total >= (nodes * GraphQueries.Scale * 9) / 10, s"lost >10% mass: $total")

    // independent reference: the same floored-integer update simulated
    // in-memory on the driver from the collected edge list
    val undirected = pairs.select("doc_a", "doc_b").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
    val deg = undirected.groupBy(_._1).map { case (u, es) => u -> es.length.toLong }
    var r: Map[Long, Long] = deg.map { case (u, _) => u -> GraphQueries.Scale }
    for (_ <- 1 to GraphQueries.Iters) {
      val in = undirected.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / deg(u) }.sum
      }
      r = in.map { case (v, s) => v -> (15 * GraphQueries.Scale + 85 * s) / 100 }
    }
    val got = out.collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("rank_micro")).toMap
    assert(got == r, "distributed ranks must equal the in-memory simulation")
    out.unpersist()
  }
}
