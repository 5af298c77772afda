package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.dedup.DedupQueries
import graft.ext.graph.GraphQueries

/** PageRank and triangle invariants over the near-dup pair graph. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

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

  test("graph_triangles: counts equal a driver brute force; coefficient arithmetic exact") {
    val out = GraphQueries.qTriangles(spark, sf).collect()
    val edges = DedupQueries.qNgramJaccard(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    assert(out.length == nodes.size, "one row per node")
    // brute force: every unordered triple with all three edges present
    def adj(u: Long, v: Long) = edges((u min v, u max v))
    val sorted = nodes.toSeq.sorted
    val triples = for {
      i <- sorted.indices; j <- (i + 1) until sorted.length
      if adj(sorted(i), sorted(j))
      k <- (j + 1) until sorted.length
      if adj(sorted(i), sorted(k)) && adj(sorted(j), sorted(k))
    } yield (sorted(i), sorted(j), sorted(k))
    val perNode = triples.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (n, xs) => n -> xs.length.toLong }
    val degs = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.length.toLong }
    out.foreach { r =>
      val n = r.getAs[Long]("doc_id")
      val t = perNode.getOrElse(n, 0L)
      val d = degs(n)
      assert(r.getAs[Long]("n_triangles") == t, s"node $n triangles")
      assert(r.getAs[Long]("degree") == d, s"node $n degree")
      assert(r.getAs[Long]("clustering_milli") ==
        (if (d >= 2) 1000L * 2 * t / (d * (d - 1)) else 0L), s"node $n coefficient")
    }
    assert(triples.nonEmpty, "fixture pair graph has at least one triangle")
  }

  test("graph_triangles: degree-oriented pivot bounds wedge fan-out on a skewed hub") {
    // hub 0 pairs with spokes 1..1000 (the boilerplate-page pattern);
    // edges (1,2) and (3,4) close two triangles through the hub
    val spokes = (1L to 1000L).map(s => (0L, s))
    val e = (spokes ++ Seq((1L, 2L), (3L, 4L))).toDF("a", "b")

    // the retired min-ID pivot would emit C(1000, 2) = 499 500 wedge rows
    // at the hub (it is the min id of every spoke edge); rank orientation
    // points every spoke edge INTO the hub, so only the two degree-2
    // spokes pivot — one wedge per triangle, nothing else
    val wedges = GraphQueries.orientedWedges(GraphQueries.orientEdges(e)).collect()
    assert(wedges.length == 2, s"wedge fan-out not degree-bounded: ${wedges.length} rows")

    val out = GraphQueries.trianglesFrom(e).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("degree"), r.getAs[Long]("n_triangles"), r.getAs[Long]("clustering_milli")))
      .toMap
    assert(out(0L) == ((1000L, 2L, 0L)), s"hub row: ${out(0L)}")  // 1000*4/999000 floors to 0
    Seq(1L, 2L, 3L, 4L).foreach { s =>
      assert(out(s) == ((2L, 1L, 1000L)), s"spoke $s row: ${out(s)}")
    }
    (5L to 1000L).foreach { s =>
      assert(out(s) == ((1L, 0L, 0L)), s"leaf $s row: ${out(s)}")
    }
  }
}
