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

  test("graph_kcore: trees peel to empty, cycles survive whole, corpus peel matches a driver fixpoint") {
    // the 2-core of any tree is empty: a 6-node path peels from both ends,
    // gone within 3 rounds
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    assert(GraphQueries.kcoreFrom(path).count() == 0L, "path graph must peel away")
    // a cycle is its own 2-core: every node survives at degree exactly 2
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val c = GraphQueries.kcoreFrom(cycle).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(c == (1L to 4L).map(n => (n, 2L, true)).toSet, s"cycle core: $c")
    // a cycle with a pendant tail: tail peels, cycle stays
    val tailed = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 9L), (9L, 10L)).toDF("a", "b")
    val t = GraphQueries.kcoreFrom(tailed).collect().map(_.getLong(0)).toSet
    assert(t == Set(1L, 2L, 3L), s"tailed-cycle core: $t")

    // corpus run: matches a driver-side peel run to FIXPOINT — i.e. 3
    // rounds converge on this graph (every survivor flags in_core)
    val pairs = DedupQueries.qNgramJaccard(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    var adj = (pairs.map(p => (p._1, p._2)) ++ pairs.map(p => (p._2, p._1))).toSeq
    var changed = true
    while (changed) {
      val deg = adj.groupBy(_._1).map { case (n, es) => n -> es.size }
      val keep = deg.filter(_._2 >= GraphQueries.CoreK).keySet
      val next = adj.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != adj.size
      adj = next
    }
    val want = adj.groupBy(_._1).map { case (n, es) => (n, es.size.toLong, true) }.toSet
    val got = GraphQueries.qKcore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == want, s"corpus core mismatch: ${got.size} vs ${want.size}")
    assert(got.forall(_._3), "3 rounds did not converge on the corpus graph")
  }
}
