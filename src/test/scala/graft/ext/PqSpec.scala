package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.sim.{PqQueries, SimQueries}
import graft.sources.Tables

/** Compressed-domain search quality and int8 quantization invariants. */
class PqSpec extends SparkSpec {

  test("knn_pq: well-formed top-K and recall far above the random floor") {
    val pq = PqQueries.qKnnPq(spark, sf)
    // exactly K ascending-adc rows per query
    val bad = pq.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mr"))
      .filter(col("n") =!= SimQueries.K || col("mr") =!= SimQueries.K)
    assert(bad.count() == 0)

    val truth = SimQueries.qKnnBrute(spark, sf)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pq.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.intersect(got).size.toDouble / truth.size
    // random embeddings are PQ's worst case (no cluster structure for the
    // codebook to exploit); the random-guess floor is K/N ≈ 0.017, so
    // anything ≥ 0.1 proves the ADC ranking carries real signal
    assert(recall >= 0.1, s"PQ recall@${SimQueries.K} = $recall at the random floor")
  }

  test("emb_quantize: per-dim grain, codes bounded, error bounded by half-step") {
    val out = PqQueries.qEmbQuantize(spark, sf).cache()
    assert(out.count() == SimQueries.Dim)
    val n = graft.ext.dedup.DedupQueries.quantized(spark, sf).count()
    // rounding guarantees |127x − q8·amax| ≤ amax/2 (+1 for the floor
    // tie), so sse per dim is below n·(amax/2 + 1)²
    val overErr = out.filter(
      col("sse") > lit(n) * (col("amax") / 2 + 1) * (col("amax") / 2 + 1))
    assert(overErr.count() == 0, "reconstruction error exceeds the half-step bound")
    assert(out.filter(col("n_saturated") > n).count() == 0)
    assert(out.filter(col("amax") <= 0).count() == 0)
    out.unpersist()
  }

  test("emb_norm_audit equals a driver census; this corpus certifies as normalized") {
    val rows = Tables.embeddings(spark, sf)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    val expected = rows.groupBy(_._1).map { case (lab, vs) =>
      val quant = vs.map(_._2.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong))
      val nsqs = quant.map(q => q.map(y => y * y).sum)
      (lab, vs.length.toLong, quant.map(_.length.toLong).min,
        quant.map(_.length.toLong).max, nsqs.count(_ == 0L).toLong,
        nsqs.min, nsqs.max,
        if (nsqs.max > 0) Some(1000L * nsqs.min / nsqs.max) else None)
    }.toSet
    val got = SimQueries.qEmbNormAudit(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6),
        if (r.isNullAt(7)) None else Some(r.getLong(7)))).toSet
    assert(got == expected && got.nonEmpty)
    // the gate's verdicts on THIS corpus: uniform 64-dim, no zero
    // vectors, norms within 1% of each other — cosine ≡ dot is safe
    got.foreach { case (lab, _, dMin, dMax, nZero, _, _, spread) =>
      assert(dMin == 64L && dMax == 64L && nZero == 0L, s"label $lab")
      assert(spread.exists(_ >= 990L), s"label $lab spread $spread")
    }
  }
}
