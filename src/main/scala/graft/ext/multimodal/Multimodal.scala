package graft.ext.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** A multimodal corpus row: media payload as an opaque binary column plus
  * typed metadata. At 100 TB the binary column lives in parquet alongside
  * its metadata — never file-per-object — so scans prune metadata columns
  * without touching payload bytes. */
case class MediaItem(
    id: Long,
    modality: String,           // "image" | "audio" | "video" | "text"
    format: String,             // container/codec tag, e.g. "png", "wav"
    content: Array[Byte],
    width: Int, height: Int,    // image/video metadata (0 when n/a)
    sample_rate: Int,           // audio metadata (0 when n/a)
    duration_ms: Long)          // audio/video metadata (0 when n/a)

/** Extracted per-item features (decode output contract). */
case class MediaFeatures(
    id: Long,
    modality: String,
    n_bytes: Long,
    byte_hist: Array[Long],     // 8-bucket byte histogram (stub features)
    checksum: String)

/**
 * Multimodal-column plumbing: schema, partition-friendly batch iteration,
 * and decode/resize/frame-sample operators.
 *
 * The DECODE STEP IS A STUB — this container has no image/audio codecs, so
 * `decodeStub` computes a deterministic fake feature (byte histogram) in
 * place of a real `ImageIO.read`/PCM decode. Everything around it — the
 * binary-column schema, the mapPartitions batch shape (fixed-size buffers,
 * one codec init per partition, never per row), and the output contract —
 * is the real production plumbing and is what the tests pin down.
 */
object Multimodal {

  val BatchSize = 64   // rows decoded per in-memory batch within a partition

  /** Deterministic corpus: documents' text bytes dressed as media payloads
    * (modality assigned round-robin) — a stand-in with realistic shape. */
  def corpus(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(
      col("doc_id").as("id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      element_at(array(lit("png"), lit("wav"), lit("mkv")),
        (col("doc_id") % 3 + 1).cast("int")).as("format"),
      encode(coalesce(col("text"), lit("")), "UTF-8").as("content"),
      (col("n_chars") % 1920).cast("int").as("width"),
      (col("n_chars") % 1080).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (col("n_chars") * 10).as("duration_ms")).as[MediaItem]
  }

  /** STUB for the real codec call: deterministic 8-bucket byte histogram.
    * A production build swaps ONLY this function for the actual decoder
    * (e.g. `javax.imageio.ImageIO.read` / an FFI codec binding). */
  private def decodeStub(content: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](8)
    var i = 0
    while (i < content.length) {
      hist((content(i) & 0xFF) >>> 5) += 1
      i += 1
    }
    hist
  }

  /** Feature extraction over partitions in fixed-size batches: the codec
    * (here: a MessageDigest as its stand-in) initializes once per
    * partition, rows buffer into BatchSize groups — the exact shape a
    * vectorized/Arrow decode needs, so swapping the stub keeps the plan. */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("MD5") // per-partition init
      rows.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { m =>
          digest.reset()
          val sum = digest.digest(m.content).map("%02x".format(_)).mkString
          MediaFeatures(m.id, m.modality, m.content.length.toLong,
            decodeStub(m.content), sum)
        }
      }
    }
  }

  /** "Resize" stub: content-preserving truncation standing in for a pixel
    * resample — keeps the binary-in/binary-out operator contract. */
  def resize(items: Dataset[MediaItem], maxBytes: Int): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.map(m => m.copy(content = m.content.take(maxBytes)))
  }

  /** Frame-sample stub: every nth BatchSize-byte block of the payload —
    * the video-frame-extraction operator shape (1 row in, k rows out). */
  def frameSample(spark: SparkSession, items: Dataset[MediaItem], everyNth: Int): DataFrame = {
    import spark.implicits._
    items.flatMap { m =>
      m.content.grouped(BatchSize).zipWithIndex
        .filter(_._2 % everyNth == 0)
        .map { case (block, idx) => (m.id, idx.toLong, block) }
    }.toDF("id", "frame_idx", "frame_bytes")
  }

  /** Oracled metadata query: per-source payload stats over the binary
    * column — proves the schema/pruning path without touching the stub. */
  def qMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("source"),
      length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
      md5(col("text")).as("checksum"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("checksum")).as("min_checksum"))

  /** The typed decode pipeline under the hash gate: runs the REAL
    * [[extractFeatures]] path (case-class Dataset, mapPartitions batches,
    * per-partition codec init) and aggregates its stub features per
    * modality — so the oracle exercises the mapPartitions plumbing and the
    * decode contract, not just the metadata projection. The DuckDB twin
    * recomputes the byte histogram from hex-expanded payload bytes; a
    * production decoder swap intentionally breaks this oracle (features
    * would no longer be a pure function DuckDB can replay) and downgrades
    * the query to the rows-only check. */
  def qFeatures(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(corpus(spark, dir)).toDF()
    val hs = (0 until 8).map(k => sum(element_at(col("byte_hist"), k + 1)).as(s"h$k"))
    feats.groupBy(col("modality"))
      .agg(count(lit(1)).as("n_items"),
        (sum(col("n_bytes")).as("total_bytes") +: hs): _*)
  }

  /** Exact payload dedup over the typed media corpus: one group per
    * distinct content digest, keeper = min id — byte-identical image/audio
    * dedup, the first pass of any multimodal pipeline (cheap, catches the
    * mirror-crawl bulk before perceptual hashing). The digest is computed
    * over the BINARY column; `n_modalities` reports when identical bytes
    * arrived under different modality tags (mislabeled feeds). One shuffle
    * on the 128-bit digest, same scale shape as text `dedup_exact`. The
    * DuckDB twin hashes the text (payloads here are UTF-8 text bytes, so
    * the digests coincide); with real media bytes the oracle would hash
    * the hex dump instead. */
  def qMmDedup(spark: SparkSession, dir: String): DataFrame =
    corpus(spark, dir).toDF()
      .select(col("id"), col("modality"), md5(col("content")).as("checksum"))
      .groupBy(col("checksum"))
      .agg(min(col("id")).as("keeper_id"),
        count(lit(1)).as("n_copies"),
        countDistinct(col("modality")).as("n_modalities"))

  /** Sampling interval for the registered frame query: every 2nd block. */
  val FrameEveryNth = 2

  /** The frame-sampling plumbing under the hash gate: runs the REAL
    * [[frameSample]] path (typed flatMap, 1 payload row → k frame rows)
    * and emits per-frame signatures + sizes — the video-keyframe /
    * audio-chunk extraction shape, verifiable because the stub "frames"
    * are deterministic byte blocks. The DuckDB twin slices the text
    * payload directly (this corpus is pure ASCII, so VARCHAR chars ≡
    * payload bytes — same coincidence mm_dedup's oracle relies on); a
    * real codec swap downgrades this to the rows-only check. */
  def qFrames(spark: SparkSession, dir: String): DataFrame =
    frameSample(spark, corpus(spark, dir), FrameEveryNth)
      .select(col("id"), col("frame_idx"),
        md5(col("frame_bytes")).as("frame_sig"),
        length(col("frame_bytes")).cast("long").as("n_bytes"))

  /** Minimum shared (distinct) frame signatures for a candidate pair. */
  val MinSharedFrames = 2L

  /** A frame signature shared by more than this many items is dropped
    * before pair generation — the MaxShingleDf device: a boilerplate
    * block (silence, black frames, a house intro) contributes df² pairs
    * and zero discrimination. */
  val MaxFrameSigDf = 64L

  /** PARTIAL-overlap copy detection across the binary corpus: item pairs
    * sharing ≥ [[MinSharedFrames]] distinct frame signatures — where
    * [[qMmDedup]] catches only byte-identical payloads, this catches the
    * re-container/clip/prefix relationships a video pipeline actually
    * hunts (two files sharing a run of identical keyframes), off the
    * SAME frame artifact as mm_frames. The same posting-list discipline
    * as the text dedup family: (item, sig) deduped first so repeated
    * blocks inside one item can't inflate the count, df-capped sigs so
    * a boilerplate block never explodes pair generation, candidate mass
    * keyed by actual duplication.
    *
    * Shape: one sig-keyed exchange builds the posting frame, the
    * df-capped self-join explodes only co-signature pairs, and the pair
    * aggregate is match-sized. At real scale this IS dedup_ngram_capped
    * over frame sigs instead of shingle hashes — same plan, same caps. */
  def qFramesDedup(spark: SparkSession, dir: String): DataFrame = {
    val fr = qFrames(spark, dir).select(col("id"), col("frame_sig")).distinct()
    val ok = fr.groupBy(col("frame_sig")).agg(count(lit(1)).as("sig_df"))
      .filter(col("sig_df") <= MaxFrameSigDf).select(col("frame_sig"))
    val kept = fr.join(ok, Seq("frame_sig"))
    kept.select(col("frame_sig"), col("id").as("id_a"))
      .join(kept.select(col("frame_sig"), col("id").as("id_b")), Seq("frame_sig"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared_frames"))
      .filter(col("n_shared_frames") >= MinSharedFrames)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta"     -> (qMeta _),
    "mm_features" -> (qFeatures _),
    "mm_frames"   -> (qFrames _),
    "mm_frames_dedup" -> (qFramesDedup _),
    "mm_dedup"    -> (qMmDedup _))

  // BatchSize-byte blocks, 0-based index, every FrameEveryNth-th kept;
  // char slicing ≡ byte slicing on this pure-ASCII corpus. Shared by the
  // mm_frames oracle and the frame-dedup oracle built on it — one truth.
  private lazy val framesSql: String =
    s"""WITH m AS (SELECT doc_id, coalesce(text, '') AS b FROM documents),
       |idx AS (
       |  SELECT doc_id, b, unnest(generate_series(1,
       |    CAST(ceil(CAST(length(b) AS DOUBLE) / $BatchSize) AS BIGINT))) AS i
       |  FROM m),
       |fr AS (
       |  SELECT doc_id, i - 1 AS frame_idx,
       |    substr(b, (i - 1) * $BatchSize + 1, $BatchSize) AS fb
       |  FROM idx)
       |SELECT doc_id AS id, CAST(frame_idx AS BIGINT) AS frame_idx,
       |  md5(fb) AS frame_sig, CAST(length(fb) AS BIGINT) AS n_bytes
       |FROM fr WHERE frame_idx % $FrameEveryNth = 0""".stripMargin

  val oracles: Map[String, String] = Map(
    "mm_frames" -> framesSql,
    // the frames statement nests verbatim; (item, sig) deduped before the
    // df cap and the self-join, so the pair count is distinct shared sigs
    "mm_frames_dedup" ->
      s"""WITH f AS (
         |$framesSql
         |),
         |d AS (SELECT DISTINCT id, frame_sig FROM f),
         |c AS (SELECT frame_sig FROM d GROUP BY 1
         |      HAVING count(*) <= $MaxFrameSigDf),
         |k AS (SELECT d.id, d.frame_sig FROM d JOIN c USING (frame_sig))
         |SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared_frames
         |FROM k a JOIN k b ON a.frame_sig = b.frame_sig AND a.id < b.id
         |GROUP BY 1, 2 HAVING count(*) >= $MinSharedFrames""".stripMargin,
    "mm_dedup" ->
      """SELECT md5(coalesce(text, '')) AS checksum,
        |  min(doc_id) AS keeper_id, count(*) AS n_copies,
        |  count(DISTINCT ['image','audio','video'][(doc_id % 3 + 1)]) AS n_modalities
        |FROM documents GROUP BY 1""".stripMargin,
    "mm_meta" ->
      """SELECT source, count(*) AS n_items,
        |  CAST(sum(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT) AS total_bytes,
        |  min(md5(text)) AS min_checksum
        |FROM documents GROUP BY 1""".stripMargin,
    "mm_features" -> {
      // bucket k of the stub histogram = count of payload bytes with
      // value >> 5 == k; bytes recovered from the hex dump two chars at
      // a time (unsigned, multi-byte UTF-8 handled byte-wise like the JVM
      // side). Empty payloads contribute no bytes, matching the stub loop.
      val bucketSums = (0 until 8).map(k =>
        s"CAST(sum(CASE WHEN bk = $k THEN 1 ELSE 0 END) AS BIGINT) AS h$k").mkString(",\n  ")
      s"""WITH m AS (
         |  SELECT doc_id,
         |    ['image','audio','video'][(doc_id % 3 + 1)] AS modality,
         |    encode(coalesce(text, '')) AS b
         |  FROM documents),
         |sized AS (SELECT modality, CAST(octet_length(b) AS BIGINT) AS nb, b FROM m),
         |per_mod AS (
         |  SELECT modality, count(*) AS n_items, CAST(sum(nb) AS BIGINT) AS total_bytes
         |  FROM sized GROUP BY 1),
         |expl AS (
         |  SELECT modality,
         |    unnest([CAST('0x' || substr(hex(b), 2 * i - 1, 2) AS INT) >> 5
         |            for i in generate_series(1, CAST(nb AS INT))]) AS bk
         |  FROM sized),
         |hist AS (
         |  SELECT modality,
         |  $bucketSums
         |  FROM expl GROUP BY 1)
         |SELECT p.modality, p.n_items, p.total_bytes,
         |  ${(0 until 8).map(k => s"h.h$k").mkString(", ")}
         |FROM per_mod p JOIN hist h ON p.modality = h.modality""".stripMargin
    })
}
