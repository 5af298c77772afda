package graft.ext.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.dedup.DedupQueries.quantized
import graft.functions.VectorFunctions

/**
 * Compressed-domain vector operations: product quantization (PQ) search
 * and int8 scalar quantization — the two compression paths that make a
 * 100 TB embedding corpus tractable. A 64-dim float vector is 256 bytes;
 * its PQ code is [[M]] bytes and its int8 form 64 bytes, so the working
 * set drops 32× / 4× and the ADC scan reads codes, never raw vectors.
 *
 * Same determinism discipline as the rest of graft.ext.sim: all distances
 * are exact BIGINT arithmetic over micro-unit integer vectors
 * ([[graft.ext.dedup.DedupQueries.quantized]]), ties break on id, and the
 * DuckDB oracles replay the identical argmin/LUT arithmetic — the
 * quantizer's *approximation behavior* is under the hash gate, not just
 * its plumbing.
 */
object PqQueries {

  /** Subspaces: 64 dims → [[M]] blocks of [[SubDim]]. */
  val M = 8
  val SubDim: Int = SimQueries.Dim / M
  /** Codes per subspace codebook (one byte would hold 256; 16 keeps the
    * oracle's argmin CTE readable and the demo honest at corpus size). */
  val PqK = 16

  /** Codebook = the sub-vectors of the [[PqK]] lowest vec_ids — a
    * deterministic sample, the same seeding rule as the k-means trainer's
    * seeds ([[SimQueries.qKmeansTrain]]); a production index would run
    * that trainer per subspace (identical plan shape, [[M]] independent
    * small k-means jobs) and hand the trained codebooks to THIS search —
    * the codebook source is orthogonal to the encode/ADC kernel under
    * test. Indexed [m][j][dim-within-subspace]; dimension-sized driver
    * state, like the k-means centroid literals. */
  private def codebook(spark: SparkSession, dir: String): Array[Array[Array[Long]]] = {
    val seed = graft.util.Bounded.boundedCollect(
      quantized(spark, dir).select(col("vec_id"), col("v"))
        .orderBy(col("vec_id")).limit(PqK), PqK, "pq codebook seed")
      .map(r => r.getSeq[Long](1).toArray)
    Array.tabulate(M)(m => seed.map(v => v.slice(m * SubDim, (m + 1) * SubDim)))
  }

  private def subv(v: Column, m: Int): Column = slice(v, m * SubDim + 1, SubDim)

  /** ‖c‖² − 2·x_m·c — the exact-integer subspace distance score (the x·x
    * term is constant within a per-subspace argmin and within a fixed
    * query's ranking, so it cancels everywhere it must). */
  private def distTo(v: Column, m: Int, c: Array[Long]): Column =
    lit(c.map(x => x * x).sum) -
      lit(2L) * VectorFunctions.arrayDotLong(subv(v, m), lit(c))

  /** PQ-encoded corpus: each vector's [[M]] one-byte codes — the argmin
    * over codebook literals, one narrow codegen'd pass (same shape as the
    * k-means assignment). This is the index-build job; at 100 TB its
    * output (id + cell + M bytes) is what the ANN serving layer stores —
    * the `label` cell id rides along so the IVFADC composition can
    * shard/prune the codes table by cell. */
  private def encoded(spark: SparkSession, dir: String,
                      cb: Array[Array[Array[Long]]]): DataFrame =
    (0 until M).foldLeft(quantized(spark, dir).select(col("vec_id"), col("label"), col("v"))) {
      (df, m) =>
        df.withColumn(s"code_$m",
          array_min(array(cb(m).zipWithIndex.toIndexedSeq.map { case (c, j) =>
            struct(distTo(col("v"), m, c).as("dist"), lit(j.toLong).as("j"))
          }: _*)).getField("j"))
    }.select(col("vec_id") +: col("label") +: (0 until M).map(m => col(s"code_$m")): _*)

  /** Per-query ADC lookup tables — [[M]] arrays of [[PqK]] exact subspace
    * distances to every codebook entry, materialized once per query batch
    * (the deployment shape: LUT build is per-batch work against codebook
    * literals). Shared by the flat scan ([[qKnnPq]]) and the cell-pruned
    * scan ([[qKnnIvfPq]]) so both tiers search with the identical tables. */
  private def lutsFor(spark: SparkSession, dir: String,
                      cb: Array[Array[Array[Long]]]): DataFrame =
    (0 until M).foldLeft(
      quantized(spark, dir)
        .filter(col("vec_id") % SimQueries.QueryStride === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nsq").as("qn"))) {
      (df, m) =>
        df.withColumn(s"lut_$m",
          array(cb(m).toIndexedSeq.map(c => distTo(col("qv"), m, c)): _*))
    }.drop("qv")

  /** The persisted PQ index artifact — the encoded corpus, snapshot-shared
    * (like `knn_truth`) by the flat-ADC tier, the IVFADC tier, and the
    * ann_eval calibration card. At 100 TB this IS the serving-layer table
    * (id + cell + [[M]] bytes, 32×-compressed); building it once per
    * corpus version and fanning consumers out from the artifact is the
    * deployment shape, so the in-process cache mirrors it. */
  def codesSnapshot(spark: SparkSession, dir: String): DataFrame =
    graft.util.SnapshotCache.snapshot("pq_codes", spark, dir) {
      encoded(spark, dir, codebook(spark, dir))
    }

  /** The per-query-batch ADC lookup tables, snapshot-shared for the same
    * reason: both PQ tiers (and ann_eval through them) search with the
    * identical tables, and a batch's LUTs are built once per batch. */
  def lutSnapshot(spark: SparkSession, dir: String): DataFrame =
    graft.util.SnapshotCache.snapshot("pq_luts", spark, dir) {
      lutsFor(spark, dir, codebook(spark, dir))
    }

  /** The ADC score: [[M]] lookups into the per-query tables + ‖q‖². */
  private def adcCol: Column =
    (0 until M).map(m =>
      element_at(col(s"lut_$m"), (col(s"code_$m") + 1).cast("int"))).reduce(_ + _) +
      col("qn")

  /** PQ search with asymmetric distance computation (ADC): queries stay
    * exact; each query precomputes a [[M]]×[[PqK]] lookup table of exact
    * subspace distances to every code, and a candidate's approximate
    * squared distance is [[M]] table lookups + ‖q‖² — no per-pair vector
    * arithmetic at all. Top-[[SimQueries.K]] per query by (adc, id).
    *
    * Scale shape: the LUT build is per-query work against codebook
    * LITERALS; the scan is a nested-loop join against the CODES table
    * (M bytes/row, the 32×-compressed corpus), with per-pair cost eight
    * `element_at` calls inside codegen. At 100 TB the codes table is what
    * IVF cells would shard; composing PQ inside IVF cells (IVFADC) is
    * this plan with [[SimQueries.qKnnIvf]]'s probe stage in front. */
  def qKnnPq(spark: SparkSession, dir: String): DataFrame = {
    // Both join inputs MATERIALIZE (snapshot checkpoint) before the scan
    // join: leaving these two tiny giant-literal projections (128 codebook
    // arrays each) inline under the join→window stage measured 43–56 s vs
    // 1.4 s materialized at sf0.1, with every stage individually fast —
    // the planner keeps the monster expressions inside the top-k stage and
    // execution falls off the codegen fast path. Materialization is also
    // the honest deployment shape: the codes table IS the persisted ANN
    // index artifact, and a query batch's LUTs are built once per batch —
    // both are snapshot-shared with qKnnIvfPq and ann_eval.
    val codes = codesSnapshot(spark, dir)
    val luts = lutSnapshot(spark, dir)
    val w = Window.partitionBy("query_id").orderBy(col("adc"), col("vec_id"))
    // broadcast the LUT side EXPLICITLY: it is bounded by the query batch
    // (the docstring's deployment shape), and without the hint the
    // nested-loop direction rests on size estimates — at scale the codes
    // table must stream, never shuffle into a cartesian
    broadcast(luts).join(codes, col("vec_id") =!= col("query_id"))
      .withColumn("adc", adcCol)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= SimQueries.K)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"), col("adc"))
  }

  /** IVFADC — the billion-scale ANN composition (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011 §IV): IVF cell
    * probing bounds WHICH vectors are scored, PQ codes bound WHAT each
    * score costs. Queries probe the [[SimQueries.NProbe]] nearest cells
    * (the [[SimQueries.qKnnIvf]] probe stage, shared verbatim), then rank
    * ONLY the probed cells' members by ADC over the [[M]]-byte codes —
    * no raw corpus vector is ever read at search time.
    *
    * Scale shape: candidate mass drops from O(N) per query (qKnnPq's flat
    * scan) to O(N·nprobe/cells), and each candidate costs [[M]] lookups
    * against an M-byte row — the codes table shards by cell id, so a
    * probe is a partition-pruned scan of a 32×-compressed index. This is
    * the plan a 10⁹-vector corpus actually serves; the flat-ADC and
    * exact-IVF tiers remain as its two calibration anchors, and ann_eval
    * measures all three against brute-force truth. */
  def qKnnIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val codes = codesSnapshot(spark, dir)
    val luts = lutSnapshot(spark, dir)
    val cells = SimQueries.ivfProbes(spark, dir).select(col("query_id"), col("label"))
    val w = Window.partitionBy("query_id").orderBy(col("adc"), col("vec_id"))
    luts.join(cells, "query_id")
      .join(codes, Seq("label"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc", adcCol)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= SimQueries.K)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("label"),
        col("rank"), col("adc"))
  }

  /** Int8 scalar quantization audit: per-dimension symmetric quantization
    * q8 = round(127·x / max|x|), reported at per-dimension grain — the
    * max-abs scale, how many values saturate, the code sum, and the exact
    * squared reconstruction error in scaled units (Σ(127x − q8·amax)², an
    * all-integer identity — no float error term in the error metric
    * itself). This is the compression-calibration job: its output decides
    * per-dimension scales for an int8 export of the corpus.
    *
    * Scale shape: one narrow posexplode pass, a 64-key max aggregate
    * (broadcast back), one more narrow pass, a 64-key final aggregate —
    * nothing wider than the dimension count ever shuffles. */
  def qEmbQuantize(spark: SparkSession, dir: String): DataFrame = {
    val ex = quantized(spark, dir)
      .select(posexplode(col("v")).as(Seq("i0", "x")))
      .select((col("i0") + 1).cast("long").as("i"), col("x"))
    val amax = ex.groupBy(col("i"))
      .agg(greatest(max(abs(col("x"))), lit(1L)).as("amax"))
    ex.join(broadcast(amax), "i")
      .withColumn("q8",
        floor(col("x") * lit(127.0) / col("amax") + lit(0.5)).cast("long"))
      .withColumn("e", lit(127L) * col("x") - col("q8") * col("amax"))
      .groupBy(col("i"), col("amax"))
      .agg(
        count(when(abs(col("q8")) === 127, lit(1))).as("n_saturated"),
        sum(col("q8")).as("sum_q8"),
        sum(col("e") * col("e")).as("sse"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_pq"       -> (qKnnPq _),
    "knn_ivf_pq"   -> (qKnnIvfPq _),
    "emb_quantize" -> (qEmbQuantize _))

  // ------------------------------------------------------------- oracles

  private def ccSql(c: String) = s"CAST(list_sum([y * y for y in $c]) AS BIGINT)"
  private def sliceSql(v: String) = s"list_slice($v, m * $SubDim + 1, (m + 1) * $SubDim)"

  /** Subspace codebook + per-(vector, subspace) distance CTEs shared by
    * encode and LUT: the same ‖c‖² − 2·x_m·c score as the Spark side. */
  private val pqCtes =
    s"""cb AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, v
       |  FROM (SELECT vec_id, v FROM q ORDER BY vec_id LIMIT $PqK)),
       |cbs AS (
       |  SELECT j, m, ${sliceSql("v")} AS c
       |  FROM cb, generate_series(0, ${M - 1}) t(m)),
       |codes AS (
       |  SELECT vec_id, m, j AS code FROM (
       |    SELECT x.vec_id, s.m, s.j,
       |      ${ccSql("s.c")} - 2 * ${SimQueries.dotSql(s"list_slice(x.v, s.m * $SubDim + 1, (s.m + 1) * $SubDim)", "s.c")} AS dist
       |    FROM q x, cbs s)
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, j) = 1),
       |luts AS (
       |  SELECT query_id, m, j,
       |    ${ccSql("s.c")} - 2 * ${SimQueries.dotSql(s"list_slice(qs.qv, s.m * $SubDim + 1, (s.m + 1) * $SubDim)", "s.c")} AS d
       |  FROM qs, cbs s)""".stripMargin

  /** The IVFADC statement — the knn_ivf oracle's probe CTEs composed in
    * front of the PQ code/LUT CTEs, candidate generation restricted to
    * probed cells exactly as the Spark plan restricts it. Shared by the
    * knn_ivf_pq gate and [[SimQueries]]'s ann_eval oracle (lazy for the
    * cross-object-init reason documented there). */
  private[sim] lazy val knnIvfPqSql: String =
    s"""WITH ${SimQueries.baseCtes},
       |${SimQueries.ivfProbeCtes},
       |$pqCtes,
       |adcs AS (
       |  SELECT p.query_id, c.vec_id, p.label, CAST(sum(l.d) AS BIGINT) AS s
       |  FROM probes p
       |  JOIN q c ON c.label = p.label AND c.vec_id <> p.query_id
       |  JOIN codes x ON x.vec_id = c.vec_id
       |  JOIN luts l ON l.query_id = p.query_id AND l.m = x.m AND l.j = x.code
       |  GROUP BY 1, 2, 3)
       |SELECT a.query_id, a.vec_id AS neighbor_id, a.label,
       |  row_number() OVER (PARTITION BY a.query_id ORDER BY a.s + qs.qn, a.vec_id) AS rank,
       |  a.s + qs.qn AS adc
       |FROM adcs a JOIN qs ON qs.query_id = a.query_id
       |QUALIFY rank <= ${SimQueries.K}""".stripMargin

  lazy val oracles: Map[String, String] = Map(
    "knn_pq" ->
      s"""WITH ${SimQueries.baseCtes},
         |$pqCtes,
         |adcs AS (
         |  SELECT l.query_id, x.vec_id, CAST(sum(l.d) AS BIGINT) AS s
         |  FROM codes x
         |  JOIN luts l ON l.m = x.m AND l.j = x.code AND l.query_id <> x.vec_id
         |  GROUP BY 1, 2)
         |SELECT a.query_id, a.vec_id AS neighbor_id,
         |  row_number() OVER (PARTITION BY a.query_id ORDER BY a.s + qs.qn, a.vec_id) AS rank,
         |  a.s + qs.qn AS adc
         |FROM adcs a JOIN qs ON qs.query_id = a.query_id
         |QUALIFY rank <= ${SimQueries.K}""".stripMargin,
    "knn_ivf_pq" -> knnIvfPqSql,
    "emb_quantize" ->
      s"""WITH ${graft.ext.dedup.DedupQueries.quantizedSql},
         |ex AS (
         |  SELECT i, v[i] AS x
         |  FROM q, generate_series(1, ${SimQueries.Dim}) t(i)),
         |am AS (
         |  SELECT i, greatest(max(abs(x)), 1) AS amax FROM ex GROUP BY 1),
         |qq AS (
         |  SELECT e.i, am.amax, e.x,
         |    CAST(floor(CAST(e.x AS DOUBLE) * 127.0 / am.amax + 0.5) AS BIGINT) AS q8
         |  FROM ex e JOIN am USING (i))
         |SELECT i, amax,
         |  count(CASE WHEN abs(q8) = 127 THEN 1 END) AS n_saturated,
         |  CAST(sum(q8) AS BIGINT) AS sum_q8,
         |  CAST(sum((127 * x - q8 * amax) * (127 * x - q8 * amax)) AS BIGINT) AS sse
         |FROM qq GROUP BY 1, 2""".stripMargin)
}
