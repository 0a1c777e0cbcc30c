package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fnv1a64

/** Multimodal column plumbing: opaque binary payloads with typed
  * metadata, batch decode / feature extraction via mapPartitions.
  *
  * The Spark-side shape is real — BinaryType columns, typed Encoders,
  * per-partition batch iteration (the distributed analogue of an
  * Arrow-batched pandas UDF), deterministic partitioning — while the
  * actual media decode is STUBBED (this container has no image/audio
  * codecs): `decodeStub` derives metadata and a feature vector
  * deterministically from the payload bytes. Swapping in a real codec
  * changes only the body of `decodeStub`; every schema/partition/batch
  * contract stays identical.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String,
      payload: Array[Byte])

  final case class MediaMeta(
      doc_id: Long, media_type: String, byte_len: Long, content_hash: Long,
      width: Int, height: Int, n_frames: Int, feature: Array[Float])

  /** Attach a synthetic binary payload per document (stand-in for an
    * image/audio blob column; real pipelines read these from parquet
    * binary columns directly).
    */
  def withPayload(docs: DataFrame): DataFrame = docs.select(
    col("doc_id"),
    element_at(array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
    encode(col("text"), "UTF-8").as("payload"))

  /** STUB decode: deterministic pseudo-metadata from the payload bytes.
    * A real implementation would decode the codec here (e.g. JPEG
    * headers, PCM frames) — per-partition, streaming, no driver data.
    */
  private def decodeStub(r: MediaRow): MediaMeta = {
    val h = Fnv1a64.hashBytes(r.payload)
    val w = 64 + (math.floorMod(h, 1024L)).toInt
    val ht = 64 + (math.floorMod(h >>> 10, 1024L)).toInt
    val frames = r.media_type match {
      case "video" => 1 + (math.floorMod(h >>> 20, 240L)).toInt
      case _       => 1
    }
    val feature = Array.tabulate(8) { i =>
      // deterministic fake embedding from hash bits (STUB — replace with
      // a real feature extractor)
      val bits = (h >>> (i * 8)) & 0xffL
      (bits.toFloat / 255.0f) * 2.0f - 1.0f
    }
    MediaMeta(r.doc_id, r.media_type, r.payload.length.toLong, h, w, ht,
      frames, feature)
  }

  /** Batch decode: one pass per partition, constant memory, typed out. */
  def decodeAll(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** End-to-end pipeline: payload → partition-batch decode → per-type
    * rollup of sizes and dims. rows-only check (decode is stubbed);
    * invariants covered in ScalaTest.
    */
  def pipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = withPayload(Tables.documents(spark, dir)).as[MediaRow]
    decodeAll(media).toDF()
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("byte_len")).as("total_bytes"),
        min(col("width")).as("min_width"),
        max(col("width")).as("max_width"),
        max(col("n_frames")).as("max_frames"),
        countDistinct(col("content_hash")).as("distinct_contents"))
  }

  /** Resize stage: recompute target dimensions preserving aspect ratio
    * (pure metadata math here — a real codec would transform pixels in
    * the same per-partition pass).
    */
  def resizeMeta(meta: Dataset[MediaMeta], maxDim: Int): Dataset[MediaMeta] = {
    import meta.sparkSession.implicits._
    meta.mapPartitions(_.map { m =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(m.width, m.height))
      m.copy(width = math.max(1, (m.width * scale).toInt),
        height = math.max(1, (m.height * scale).toInt))
    })
  }

  final case class Frame(doc_id: Long, frame_index: Int, frame_hash: Long)

  /** Frame sampling: one output row per sampled frame (every `rate`-th),
    * video rows only — the explode pattern a video pipeline uses to fan
    * frames out to per-frame feature extraction.
    */
  def frameSample(meta: Dataset[MediaMeta], rate: Int): Dataset[Frame] = {
    import meta.sparkSession.implicits._
    meta.filter(_.media_type == "video").flatMap { m =>
      (0 until m.n_frames by rate).map { i =>
        // STUB frame decode: hash-derived stand-in for the frame bytes
        Frame(m.doc_id, i, m.content_hash ^ (i.toLong * Fnv1a64.Prime))
      }
    }
  }

  /** Sampled frames for every video payload (rows-only check). */
  def frames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = withPayload(Tables.documents(spark, dir)).as[MediaRow]
    frameSample(resizeMeta(decodeAll(media), maxDim = 512), rate = 30).toDF()
  }

  final case class AudioSegment(doc_id: Long, seg_index: Int,
      sample_rate: Int, start_sample: Long, win_samples: Long,
      energy_q: Long)

  /** Audio segmentation: audio payloads fan out to overlapping
    * fixed-length windows (1 s window, 50% hop) — the sharding step in
    * front of per-segment feature extraction (VAD, fbank, ASR). The
    * STUB decode derives sample rate and duration from the payload
    * hash in the UNSIGNED domain (remainderUnsigned / >>> — mirrored
    * by the oracle's HUGEINT arithmetic); per-segment quantized energy
    * stands in for the DSP. Fan-out is 2·seconds − 1 rows per clip, no
    * shuffle until a consumer aggregates.
    */
  def audioSegments(meta: Dataset[MediaMeta]): Dataset[AudioSegment] = {
    import meta.sparkSession.implicits._
    meta.filter(_.media_type == "audio").flatMap { m =>
      val h = m.content_hash
      val rate = Array(8000, 16000, 44100)(
        java.lang.Long.remainderUnsigned(h, 3L).toInt)
      val durS = 1 + java.lang.Long.remainderUnsigned(h >>> 8, 30L).toInt
      val nSamples = rate.toLong * durS
      val win = rate.toLong
      val hop = win / 2
      val nSegs = ((nSamples - win) / hop + 1).toInt
      (0 until nSegs).map { i =>
        AudioSegment(m.doc_id, i, rate, i * hop, win,
          // STUB energy: quantized hash mix — replace with real DSP
          math.floorMod(h ^ (i.toLong * Fnv1a64.Prime), 1000000L))
      }
    }
  }

  /** Overlapping 1-second segments for every audio payload. */
  def segments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = withPayload(Tables.documents(spark, dir)).as[MediaRow]
    audioSegments(decodeAll(media)).toDF()
  }

  /** EXACT payload dedup — content-hash grouping of the binary column:
    * the first pass of any image/audio dedup pipeline (byte-identical
    * copies are a large share of crawled media, and no decode is
    * needed to find them). The corpus carries no natural
    * byte-duplicates, so the gate INJECTS them deterministically —
    * docs with `doc_id % 10 == 0` carry their successor's payload (the
    * dq_quarantine dirt-injection discipline, mirrored in the oracle).
    * The report is per duplicate group: content hash (codegen FNV over
    * the payload bytes), copy count, lowest-id keeper, and the bytes a
    * dedup pass would reclaim. One scan + one digest-grain shuffle:
    * payload BYTES never shuffle, only (hash, len) pairs — the 100 TB
    * shape.
    */
  def payloadDedup(docs: DataFrame): DataFrame = {
    val donor = docs.select((col("doc_id") - 1).as("doc_id"),
      col("text").as("donor_text"))
    val base = docs.join(donor, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 0 && col("donor_text").isNotNull,
          col("donor_text")).otherwise(col("text")).as("ptext"))
    base.select(col("doc_id"),
        call_function("fnv1a64", col("ptext")).as("content_hash"),
        length(encode(col("ptext"), "UTF-8")).cast("long").as("byte_len"))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n_copies"),
        min(col("doc_id")).as("keeper_doc_id"),
        (max(col("byte_len")) * (count(lit(1)) - 1)).as("wasted_bytes"))
      .filter(col("n_copies") >= 2)
  }

  val payloadDedupSql: String = {
    import graft.operators.OracleFnv
    s"""WITH d AS (SELECT doc_id, text FROM documents),
       base AS (
         SELECT a.doc_id,
           CASE WHEN a.doc_id % 10 = 0 AND b.text IS NOT NULL
                THEN b.text ELSE a.text END AS ptext
         FROM d a LEFT JOIN d b ON b.doc_id = a.doc_id + 1),
       g AS (
         SELECT ptext, COUNT(*) AS n_copies,
           MIN(doc_id) AS keeper_doc_id
         FROM base GROUP BY ptext HAVING COUNT(*) >= 2),
       h AS (
         SELECT hex(encode(ptext)) AS hx, n_copies, keeper_doc_id,
           octet_length(encode(ptext)) AS bl
         FROM g)
       SELECT ${OracleFnv.signed(OracleFnv.fold("hx"))} AS content_hash,
         n_copies, keeper_doc_id,
         CAST(bl * (n_copies - 1) AS BIGINT) AS wasted_bytes
       FROM h
       ORDER BY content_hash"""
  }

  /** PAIR CURATION — the LAION-shape filter stage that turns raw
    * (media, caption) pairs into a training set, one decision per
    * pair with the FIRST failing rule as its reason (the
    * corpus_filter_decisions funnel discipline):
    *
    *  1. `drop_not_image`    — modality filter (image-caption runs
    *     train on images; audio/video route to their own pipelines);
    *  2. `drop_caption_len`  — caption outside [3, 64] tokens;
    *  3. `drop_dup_payload`  — byte-identical media (smallest doc_id
    *     keeps, everyone else drops — [[payloadDedup]]'s rule);
    *  4. `drop_no_embedding` — missing modality row (real crawls have
    *     them; at sf0.1 docs outnumber embeddings 5000 vs 2000, so
    *     this branch is exercised by the data, not injected);
    *  5. `drop_low_alignment`— the CLIP-score gate, STUBBED like every
    *     decode in this file: agreement between the caption
    *     embedding's first 8 sign bits and 8 bits of the payload hash
    *     (integer-exact, oracle-mirrored; a real scorer replaces the
    *     expression, the decision plumbing stays);
    *  6. else `kept`.
    *
    * Emits the per-(source, decision) funnel — the dataset-card
    * numbers a curation run publishes. One doc↔embedding key join +
    * one hash-grain window + one count aggregate; payload bytes never
    * shuffle.
    */
  def pairCuration(docs: DataFrame, emb: DataFrame): DataFrame = {
    val s = docs.sparkSession
    graft.functions.Fingerprint.register(s)
    val base = docs.select(col("doc_id"), col("source"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      size(split(Dedup.normText(col("text")), " ")).cast("long")
        .as("n_toks"),
      call_function("fnv1a64", col("text")).as("content_hash"))
    val dupW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("content_hash"))
    val signs = emb.select(col("vec_id").as("doc_id") +:
      (0 until 8).map(i =>
        (element_at(col("embedding"), i + 1) >= 0).cast("int")
          .as(s"sb_$i")): _*)
    val align = (0 until 8).map(i =>
      when(shiftright(col("content_hash"), i).bitwiseAND(lit(1L))
        === col(s"sb_$i").cast("long"), 1).otherwise(0))
      .reduce(_ + _)
    base
      .withColumn("keeper", min(col("doc_id")).over(dupW))
      .join(signs, Seq("doc_id"), "left")
      .withColumn("decision",
        when(col("media_type") =!= "image", "drop_not_image")
          .when(col("n_toks") < 3 || col("n_toks") > 64,
            "drop_caption_len")
          .when(col("keeper") =!= col("doc_id"), "drop_dup_payload")
          .when(col("sb_0").isNull, "drop_no_embedding")
          .when(align < 4, "drop_low_alignment")
          .otherwise("kept"))
      .groupBy(col("source"), col("decision"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  val pairCurationSql: String = {
    import graft.operators.OracleFnv
    val norm = "regexp_replace(lower(trim(text)), ' +', ' ', 'g')"
    val align = (0 until 8).map(i =>
      s"""CASE WHEN ((content_hash >> $i) & 1) =
            (CASE WHEN embedding[${i + 1}] >= 0 THEN 1 ELSE 0 END)
          THEN 1 ELSE 0 END""").mkString(" + ")
    s"""WITH base AS (
         SELECT doc_id, source,
           (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)]
             AS media_type,
           CAST(len(string_split($norm, ' ')) AS BIGINT) AS n_toks,
           ${OracleFnv.ofText("text")} AS content_hash
         FROM documents),
       dup AS (
         SELECT *, MIN(doc_id) OVER (PARTITION BY content_hash) AS keeper
         FROM base),
       decided AS (
         SELECT d.source,
           CASE
             WHEN d.media_type <> 'image' THEN 'drop_not_image'
             WHEN d.n_toks < 3 OR d.n_toks > 64 THEN 'drop_caption_len'
             WHEN d.keeper <> d.doc_id THEN 'drop_dup_payload'
             WHEN e.vec_id IS NULL THEN 'drop_no_embedding'
             WHEN ($align) < 4 THEN 'drop_low_alignment'
             ELSE 'kept'
           END AS decision
         FROM dup d
         LEFT JOIN embeddings e ON e.vec_id = d.doc_id)
       SELECT source, decision, CAST(COUNT(*) AS BIGINT) AS n_pairs
       FROM decided
       GROUP BY source, decision
       ORDER BY source, decision"""
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_pair_curation" -> ((s, d) =>
      pairCuration(graft.Tables.documents(s, d),
        graft.Tables.embeddings(s, d))
        .orderBy(col("source"), col("decision"))),
    "multimodal_payload_dedup" -> ((s, d) =>
      payloadDedup(graft.Tables.documents(s, d))
        .orderBy(col("content_hash"))),
    "multimodal_pipeline" -> ((s, d) => pipeline(s, d).orderBy(col("media_type"))),
    "multimodal_frames" -> ((s, d) =>
      frames(s, d).orderBy(col("doc_id"), col("frame_index"))),
    "multimodal_audio_segments" -> ((s, d) =>
      segments(s, d).orderBy(col("doc_id"), col("seg_index"))))

  // ---- DuckDB oracles ------------------------------------------------------
  // The decode is a stub, but a DETERMINISTIC one: every derived value
  // is pure arithmetic over fnv1a64(payload), which OracleFnv
  // re-derives bit-exactly — so the full pipeline (payload → decode →
  // rollup / frame fan-out) is oracle-verified even though the codec
  // itself is fake. Swapping in a real codec would demote these to
  // rows-only checks; the plumbing contract stays gate-verified now.

  /** Shared CTEs: per-doc media_type + unsigned/signed hash of the
    * payload bytes (u for the >>> shifts, h for content_hash).
    */
  private val mediaCtesSql: String =
    s"""mhx AS (
         SELECT doc_id,
           (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)]
             AS media_type,
           octet_length(encode(text)) AS byte_len,
           hex(encode(text)) AS hx
         FROM documents),
       mhash AS (
         SELECT doc_id, media_type, byte_len,
           ${OracleFnv.fold("hx")} AS u
         FROM mhx),
       msigned AS (
         SELECT doc_id, media_type, byte_len, u,
           ${OracleFnv.signed("u")} AS content_hash
         FROM mhash),
       mmeta AS (
         SELECT doc_id, media_type, byte_len, content_hash,
           CAST(64 + ((content_hash % 1024) + 1024) % 1024 AS INT) AS width,
           CAST(CASE WHEN media_type = 'video'
                THEN 1 + (u // 1048576) % 240 ELSE 1 END AS INT) AS n_frames
         FROM msigned)"""

  val pipelineSql: String =
    s"""WITH $mediaCtesSql
       SELECT media_type,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(byte_len) AS BIGINT) AS total_bytes,
         MIN(width) AS min_width,
         MAX(width) AS max_width,
         MAX(n_frames) AS max_frames,
         CAST(COUNT(DISTINCT content_hash) AS BIGINT) AS distinct_contents
       FROM mmeta
       GROUP BY media_type
       ORDER BY media_type"""

  val framesSql: String =
    s"""WITH $mediaCtesSql
       SELECT doc_id,
         CAST(unnest(range(0, n_frames, 30)) AS INT) AS frame_index,
         xor(content_hash,
           CAST(unnest(range(0, n_frames, 30)) AS BIGINT) * 1099511628211)
           AS frame_hash
       FROM mmeta
       WHERE media_type = 'video'
       ORDER BY doc_id, frame_index"""

  /** Oracle for `multimodal_audio_segments`: the stub's unsigned-domain
    * derivations (u = the HUGEINT fold) and signed-xor energy, with the
    * window fan-out as a range unnest.
    */
  val audioSegmentsSql: String =
    s"""WITH $mediaCtesSql,
       audio AS (
         SELECT doc_id, u, content_hash,
           ([8000, 16000, 44100])[CAST(u % 3 AS INT) + 1] AS sample_rate,
           1 + CAST((u // 256) % 30 AS INT) AS dur_s
         FROM msigned
         WHERE media_type = 'audio'),
       segs AS (
         SELECT doc_id, sample_rate,
           CAST(sample_rate AS BIGINT) * dur_s AS n_samples,
           CAST(sample_rate AS BIGINT) AS win,
           CAST(sample_rate AS BIGINT) // 2 AS hop,
           content_hash
         FROM audio)
       SELECT doc_id,
         CAST(i AS INT) AS seg_index,
         sample_rate,
         CAST(i AS BIGINT) * hop AS start_sample,
         win AS win_samples,
         ((xor(content_hash, CAST(i AS BIGINT) * 1099511628211) % 1000000)
           + 1000000) % 1000000 AS energy_q
       FROM segs, UNNEST(range(0, (n_samples - win) // hop + 1)) AS t(i)
       ORDER BY doc_id, seg_index"""

  def oracles: Map[String, String] = Map(
    "multimodal_pair_curation" -> pairCurationSql,
    "multimodal_payload_dedup" -> payloadDedupSql,
    "multimodal_pipeline" -> pipelineSql,
    "multimodal_frames" -> framesSql,
    "multimodal_audio_segments" -> audioSegmentsSql)
}
