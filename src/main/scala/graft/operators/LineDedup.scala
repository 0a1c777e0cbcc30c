package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** C4/CCNet-style boilerplate-line removal — the corpus-cleaning stage
  * that drops REPEATED SPANS (headers, navboxes, license blurbs) from
  * every document while keeping each document's unique prose. The
  * public recipe (C4: "we removed any line that occurred more than
  * once in the dataset"; CCNet dedups by paragraph hash) defines a
  * "line" by newline splits; this corpus is single-line word streams,
  * so the unit here is a fixed-width token segment (W = [[SegTokens]],
  * non-overlapping) — same mechanics, same shuffle shape.
  *
  * Pipeline (three shuffles, all digest- or id-keyed; the quadratic
  * "compare every line to every line" never exists):
  *  1. segment in-place: each doc's token array is sliced into
  *     ⌈n/W⌉ segments by pure array functions — no shuffle;
  *  2. count each segment digest's DISTINCT-doc frequency (shuffle by
  *     digest, map-side combinable after the per-doc distinct);
  *  3. mark segments whose digest appears in ≥ [[BoilerDocs]] docs,
  *     then rebuild each doc from its kept segments in order (shuffle
  *     by doc_id; the reconstruction is the one pass where segment
  *     text must travel).
  *
  * At 100 TB: segment digests are 32-byte md5 strings, so stage 2
  * shuffles O(corpus tokens / W) short rows; stage 3 is the same cost
  * class as any corpus rewrite. The boilerplate digest table is
  * typically tiny (shared spans only) and broadcastable — AQE picks
  * that up from runtime stats rather than a hardcoded hint.
  *
  * The rebuilt text is verified byte-exactly: `clean_fp` is the native
  * fnv1a64 of the reconstructed string, mirrored in DuckDB by the
  * HUGEINT byte fold — a hash match proves Spark and the oracle
  * rebuilt identical bytes, not just identical counts.
  *
  * Reference behavior anchor: the silver dedup/cleanse stage
  * (/root/reference/src/pipelines/silver/orders.sql drops rows by
  * constraint; this is the span-level form the reference's corpus
  * would need at LLM scale).
  */
object LineDedup {

  /** Non-overlapping segment width in tokens. */
  val SegTokens = 8

  /** A segment present in at least this many distinct docs is
    * boilerplate. 2 = "any span that occurs verbatim in another doc",
    * the C4 rule at corpus scale.
    */
  val BoilerDocs = 2

  /** Per-doc boilerplate report + byte-exact cleaned-text fingerprint:
    * (doc_id, n_segs, n_boiler, kept_tokens, removed_tokens, clean_fp).
    */
  def lineDedup(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val toks = docs.select(col("doc_id"),
      split(Dedup.normText(col("text")), " ").as("toks"))
    // slice into W-token segments with array functions — zero shuffle
    val segArr = toks.select(col("doc_id"),
      transform(
        sequence(lit(0),
          ((size(col("toks")) + lit(SegTokens - 1)) / lit(SegTokens))
            .cast("int") - lit(1)),
        i => array_join(
          slice(col("toks"), i * SegTokens + lit(1), lit(SegTokens)),
          " ")).as("segs"))
    val segs = segArr.select(col("doc_id"),
        posexplode(col("segs")).as(Seq("seg_idx", "seg_text")))
      .withColumn("dg", md5(col("seg_text").cast("binary")))
    // distinct-doc frequency per digest (the per-doc distinct makes the
    // count repeat-safe inside one doc and map-side combinable)
    val boiler = segs.select(col("dg"), col("doc_id")).distinct()
      .groupBy(col("dg")).agg(count(lit(1)).as("df_docs"))
      .filter(col("df_docs") >= BoilerDocs)
      .select(col("dg"), lit(true).as("is_boiler"))
    val flagged = segs.join(boiler, Seq("dg"), "left")
      .withColumn("is_boiler", coalesce(col("is_boiler"), lit(false)))
      .withColumn("seg_tokens",
        size(split(col("seg_text"), " ")).cast("long"))
    // rebuild each doc from kept segments in seg_idx order
    // (sort_array over (idx, text) structs pins the order inside the
    // aggregation — no window needed)
    val rebuilt = flagged.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_segs"),
      sum(when(col("is_boiler"), 1L).otherwise(0L)).as("n_boiler"),
      sum(when(!col("is_boiler"), col("seg_tokens")).otherwise(0L))
        .as("kept_tokens"),
      sum(when(col("is_boiler"), col("seg_tokens")).otherwise(0L))
        .as("removed_tokens"),
      array_join(
        transform(
          sort_array(collect_list(when(!col("is_boiler"),
            struct(col("seg_idx"), col("seg_text"))))),
          s => s.getField("seg_text")),
        " ").as("clean_text"))
    rebuilt.select(col("doc_id"), col("n_segs"), col("n_boiler"),
      col("kept_tokens"), col("removed_tokens"),
      graft.functions.Fingerprint.fnv1a64(spark, col("clean_text"))
        .as("clean_fp"))
  }

  /** Oracle: same segmentation/flag/rebuild in DuckDB, fingerprint via
    * the HUGEINT FNV fold over the rebuilt string's bytes.
    */
  val lineDedupSql: String = {
    val norm = "regexp_replace(lower(trim(text)), ' +', ' ', 'g')"
    s"""WITH toks AS (
         SELECT doc_id, string_split($norm, ' ') AS toks FROM documents),
       segs AS (
         SELECT doc_id, i AS seg_idx,
           array_to_string(
             toks[(i * $SegTokens + 1):(i * $SegTokens + $SegTokens)],
             ' ') AS seg_text
         FROM toks,
           UNNEST(generate_series(0,
             CAST(ceil(len(toks) / $SegTokens.0) AS INT) - 1)) t(i)),
       dgs AS (SELECT doc_id, seg_idx, seg_text, md5(seg_text) AS dg
               FROM segs),
       boiler AS (
         SELECT dg FROM dgs GROUP BY dg
         HAVING COUNT(DISTINCT doc_id) >= $BoilerDocs),
       flagged AS (
         SELECT d.doc_id, d.seg_idx, d.seg_text,
           (b.dg IS NOT NULL) AS is_boiler,
           len(string_split(d.seg_text, ' ')) AS seg_tokens
         FROM dgs d LEFT JOIN boiler b ON d.dg = b.dg),
       rebuilt AS (
         SELECT doc_id,
           COUNT(*) AS n_segs,
           CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boiler,
           CAST(SUM(CASE WHEN NOT is_boiler THEN seg_tokens ELSE 0 END)
             AS BIGINT) AS kept_tokens,
           CAST(SUM(CASE WHEN is_boiler THEN seg_tokens ELSE 0 END)
             AS BIGINT) AS removed_tokens,
           coalesce(string_agg(
             CASE WHEN NOT is_boiler THEN seg_text END, ' '
             ORDER BY seg_idx), '') AS clean_text
         FROM flagged GROUP BY doc_id)
       SELECT doc_id, n_segs, n_boiler, kept_tokens, removed_tokens,
         ${OracleFnv.ofText("clean_text")} AS clean_fp
       FROM rebuilt
       ORDER BY doc_id"""
  }

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_line_dedup" -> ((s, d) =>
      lineDedup(graft.Tables.documents(s, d)).orderBy(col("doc_id"))))

  def oracles: Map[String, String] = Map(
    "corpus_line_dedup" -> lineDedupSql)
}
