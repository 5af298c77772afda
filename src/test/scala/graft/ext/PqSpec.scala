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

  test("knn_ivf_pq equals a full driver-side IVFADC replay") {
    // replay the whole composition from the fixture: quantize → codebook →
    // encode → cell centroids → probe → LUT → ADC top-K, all in exact
    // integer arithmetic mirroring the engine's rules
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray))
      .sortBy(_._1)
    val m = PqQueries.M; val subDim = PqQueries.SubDim
    val cb: Array[Array[Array[Long]]] = {
      val seed = rows.take(PqQueries.PqK).map(_._3)
      Array.tabulate(m)(i => seed.map(v => v.slice(i * subDim, (i + 1) * subDim)))
    }
    def score(x: Array[Long], c: Array[Long]): Long =
      c.map(y => y * y).sum - 2L * x.zip(c).map { case (a, b) => a * b }.sum
    def codesOf(v: Array[Long]): Array[Int] = Array.tabulate(m) { i =>
      val sub = v.slice(i * subDim, (i + 1) * subDim)
      cb(i).zipWithIndex.map { case (c, j) => (score(sub, c), j) }.min._2
    }
    val cents = rows.groupBy(_._2).map { case (lab, vs) =>
      lab -> Array.tabulate(SimQueries.Dim)(d =>
        math.floor(vs.map(_._3(d)).sum.toDouble / vs.length).toLong)
    }
    val expected = rows.filter(_._1 % SimQueries.QueryStride == 0).flatMap {
      case (qid, _, qv) =>
        val qn = qv.map(y => y * y).sum
        val probed = cents.toSeq.map { case (lab, c) =>
          val cn = c.map(y => y * y).sum
          val cos = qv.zip(c).map { case (a, b) => a * b }.sum.toDouble /
            (math.sqrt(qn.toDouble) * math.sqrt(cn.toDouble))
          (lab, cos)
        }.sortBy { case (lab, cos) => (-cos, lab) }.take(SimQueries.NProbe).map(_._1).toSet
        val lut = Array.tabulate(m) { i =>
          val sub = qv.slice(i * subDim, (i + 1) * subDim)
          cb(i).map(c => score(sub, c))
        }
        rows.filter(r => probed.contains(r._2) && r._1 != qid)
          .map { case (vid, lab, v) =>
            val adc = codesOf(v).zipWithIndex.map { case (c, i) => lut(i)(c) }.sum + qn
            (vid, lab, adc)
          }
          .sortBy { case (vid, _, adc) => (adc, vid) }.take(SimQueries.K)
          .zipWithIndex.map { case ((vid, lab, adc), i) =>
            (qid, vid, lab, i + 1L, adc)
          }
    }.toSet
    val got = PqQueries.qKnnIvfPq(spark, sf)
      .select("query_id", "neighbor_id", "label", "rank", "adc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected && got.nonEmpty)
    // the probe prunes: IVFADC scores strictly fewer candidates than the
    // flat scan, yet still recalls real neighbors (sanity vs random floor)
    val truth = SimQueries.qKnnBrute(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairs = got.map(t => (t._1, t._2))
    assert(truth.intersect(pairs).nonEmpty, "IVFADC recalled nothing")
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

  test("emb_drift equals a driver replay: frozen base cells, both splits re-assigned") {
    val stride = graft.ext.dedup.DedupQueries.IncomingVecStride
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray))
    val base = rows.filter(_._1 % stride != 0)
    // frozen centroids from the base split only
    val cents = base.groupBy(_._2).map { case (cl, vs) =>
      cl -> Array.tabulate(SimQueries.Dim)(d =>
        math.floor(vs.map(_._3(d)).sum.toDouble / vs.length).toLong)
    }.toSeq.sortBy(_._1)
    def assign(v: Array[Long]): Long = cents.map { case (cl, c) =>
      (c.map(y => y * y).sum - 2L * v.zip(c).map { case (a, b) => a * b }.sum, cl)
    }.min._2
    val census = rows.groupBy(r => assign(r._3)).map { case (cell, vs) =>
      (cell, vs.count(_._1 % stride != 0).toLong, vs.count(_._1 % stride == 0).toLong)
    }
    val tb = math.max(census.map(_._2).sum, 1L)
    val ti = math.max(census.map(_._3).sum, 1L)
    val expected = census.map { case (cell, nb, ni) =>
      val sb = 1000L * nb / tb; val si = 1000L * ni / ti
      (cell, nb, ni, sb, si, math.abs(sb - si))
    }.toSet
    val got = SimQueries.qEmbDrift(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected && got.nonEmpty)
    // conservation: every vector lands in exactly one cell
    assert(got.toSeq.map(_._2).sum == rows.count(_._1 % stride != 0).toLong)
    assert(got.toSeq.map(_._3).sum == rows.count(_._1 % stride == 0).toLong)
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
