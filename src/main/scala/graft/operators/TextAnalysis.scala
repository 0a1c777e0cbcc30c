package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fingerprint

/** Text-analysis operators for LLM training-data pipelines: token
  * counting, quality scoring, language ID, and document fingerprinting.
  * All are single-pass, per-row, codegen-friendly column expressions —
  * no UDFs, no shuffle; at 100 TB these run at scan speed.
  */
object TextAnalysis {

  /** Whitespace tokens of the trimmed text. */
  def tokens(text: Column): Column = split(trim(text), " +")

  /** BPE-ish subword segmentation: letter runs, single digits,
    * punctuation runs — the shape (not the vocab) of a byte-pair
    * tokenizer's pretokenizer.
    */
  def bpeIshCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]+"), lit(0)))
      .cast("long")

  // language markers: count of DISTINCT marker words present (set
  // semantics — deterministic across engines, no regex dialect risk)
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  def langScore(toks: Column, markers: Seq[String]): Column =
    size(array_intersect(toks, array(markers.map(lit): _*))).cast("long")

  /** Heuristic language ID: argmax of marker-set hits with a fixed
    * priority order for ties ('und' when nothing matches).
    */
  def textLangId(docs: DataFrame): DataFrame = {
    val t = docs.withColumn("toks", tokens(col("text")))
    val scored = langMarkers.foldLeft(t) { case (df, (lang, markers)) =>
      df.withColumn(s"score_$lang", langScore(col("toks"), markers))
    }
    val best = langMarkers.map { case (l, _) => col(s"score_$l") }
      .reduce(greatest(_, _))
    val predicted = langMarkers.foldRight(lit("und"): Column) {
      case ((lang, _), elseC) =>
        when(col(s"score_$lang") === best && best > 0, lang).otherwise(elseC)
    }
    // first-listed lang wins ties because `when` chains evaluate in order
    val outCols = Seq(
      col("doc_id"), col("lang").as("labeled_lang"),
      predicted.as("predicted_lang"),
      (predicted === col("lang")).as("is_correct")) ++
      langMarkers.map { case (l, _) => col(s"score_$l") }
    scored.select(outCols: _*)
  }

  val textLangIdSql: String = {
    val scores = langMarkers.map { case (l, ms) =>
      val lst = ms.map(m => s"'$m'").mkString(", ")
      s"CAST(len(list_intersect(toks, [$lst])) AS BIGINT) AS score_$l"
    }.mkString(",\n           ")
    val bestExpr = langMarkers.map { case (l, _) => s"score_$l" }
      .reduce((a, b) => s"greatest($a, $b)")
    val predExpr = langMarkers.foldRight("'und'") { case ((l, _), e) =>
      s"CASE WHEN score_$l = best AND best > 0 THEN '$l' ELSE $e END"
    }
    s"""WITH t AS (
         SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS toks
         FROM documents),
       s AS (
         SELECT doc_id, lang,
           $scores
         FROM t),
       b AS (SELECT *, $bestExpr AS best FROM s)
       SELECT doc_id, lang AS labeled_lang,
         $predExpr AS predicted_lang,
         ($predExpr) = lang AS is_correct,
         score_en, score_de, score_es, score_fr, score_zh
       FROM b
       ORDER BY doc_id"""
  }

  /** Token statistics per document. */
  def textTokens(docs: DataFrame): DataFrame = docs.select(
    col("doc_id"),
    length(col("text")).cast("long").as("n_chars"),
    size(tokens(col("text"))).cast("long").as("ws_tokens"),
    size(array_distinct(tokens(col("text")))).cast("long").as("distinct_tokens"),
    bpeIshCount(col("text")).as("bpe_ish_tokens"),
    (length(col("text")).cast("double") /
      size(tokens(col("text"))).cast("double")).as("chars_per_token"))

  val textTokensSql: String =
    """SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS ws_tokens,
       CAST(len(list_distinct(string_split_regex(trim(text), ' +'))) AS BIGINT)
         AS distinct_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]+'))
         AS BIGINT) AS bpe_ish_tokens,
       CAST(length(text) AS DOUBLE)
         / CAST(len(string_split_regex(trim(text), ' +')) AS DOUBLE)
         AS chars_per_token
       FROM documents
       ORDER BY doc_id"""

  /** Lexicon-hit content filter — the wordlist-based unsafe-content
    * scorer every pretraining pipeline runs before anything
    * model-based (the C4/Gopher "bad words" pass). Set-intersection
    * semantics against a small embedded lexicon (deterministic, no
    * regex-dialect risk — the same discipline as [[langScore]]):
    * distinct-hit count, hit rate per whitespace token, and the
    * keep/flag decision at a fixed rate threshold, all exact integer
    * arithmetic until the final exact-parity division. Scan speed,
    * no shuffle.
    */
  private val unsafeLexicon: Seq[String] = Seq(
    "attack", "bomb", "gun", "kill", "poison", "weapon",
    "casino", "lottery", "viagra", "xxx")

  def textLexiconFilter(docs: DataFrame): DataFrame = {
    val toks = tokens(lower(col("text")))
    val hits = size(array_intersect(toks,
      array(unsafeLexicon.map(lit): _*))).cast("long")
    docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      hits.as("lexicon_hits"),
      (hits.cast("double") / size(tokens(col("text"))).cast("double"))
        .as("hit_rate"))
      // integer-exact threshold: flag when hits·1000 > tokens (0.1%)
      .withColumn("flagged",
        col("lexicon_hits") * 1000 > col("n_tokens"))
  }

  val textLexiconFilterSql: String = {
    val lst = unsafeLexicon.map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id,
       CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
         AS n_tokens,
       CAST(len(list_intersect(string_split_regex(trim(lower(text)), ' +'),
         [$lst])) AS BIGINT) AS lexicon_hits,
       CAST(len(list_intersect(string_split_regex(trim(lower(text)), ' +'),
           [$lst])) AS DOUBLE)
         / CAST(len(string_split_regex(trim(text), ' +')) AS DOUBLE)
         AS hit_rate,
       CAST(len(list_intersect(string_split_regex(trim(lower(text)), ' +'),
         [$lst])) AS BIGINT) * 1000
         > CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
         AS flagged
       FROM documents
       ORDER BY doc_id"""
  }

  /** Readability scoring — Flesch-reading-ease-shaped, with syllables
    * approximated by VOWEL GROUPS (deterministic regex both engines
    * speak identically; true syllabification is dictionary work no
    * corpus filter does). Sentences are terminal-punctuation runs,
    * floored at 1. The score stays in `+ − × ÷` over exact counts, so
    * it is bit-reproducible; the companion band (the actual filter
    * signal) is decided by integer cross-multiplication — no float
    * threshold at the decision boundary.
    */
  def textReadability(docs: DataFrame): DataFrame = {
    val words = size(tokens(col("text"))).cast("long")
    val sentences = greatest(lit(1L),
      size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
        .cast("long"))
    val syllables = size(regexp_extract_all(lower(col("text")),
      lit("[aeiouy]+"), lit(0))).cast("long")
    docs.select(col("doc_id"), words.as("n_words"),
      sentences.as("n_sentences"), syllables.as("n_syllables"))
      .withColumn("flesch",
        lit(206.835) -
          lit(1.015) * (col("n_words").cast("double") /
            col("n_sentences").cast("double")) -
          lit(84.6) * (col("n_syllables").cast("double") /
            col("n_words").cast("double")))
      // band by integer cross-multiplication: "hard" iff
      // syllables/words ≥ 3/2 or words/sentences ≥ 30
      .withColumn("hard_text",
        col("n_syllables") * 2 >= col("n_words") * 3 ||
          col("n_words") >= col("n_sentences") * 30)
  }

  val textReadabilitySql: String =
    """SELECT doc_id,
       CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_words,
       greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
         AS BIGINT)) AS n_sentences,
       CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
         AS n_syllables,
       206.835
         - 1.015 * (CAST(len(string_split_regex(trim(text), ' +')) AS DOUBLE)
           / CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
             AS DOUBLE))
         - 84.6 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
             AS DOUBLE)
           / CAST(len(string_split_regex(trim(text), ' +')) AS DOUBLE))
         AS flesch,
       CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) * 2
           >= CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) * 3
         OR CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
           >= greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
             AS BIGINT)) * 30
         AS hard_text
       FROM documents
       ORDER BY doc_id"""

  /** N-GRAM COUNT TABLE — the KenLM-training / contamination-analysis
    * corpus artifact: corpus-wide trigram counts with a MIN-COUNT
    * prune (singleton grams are noise and dominate the long tail) and
    * a top-K bound under a total order, so the output is
    * vocabulary-scale however large the corpus. The explode fans each
    * doc into (len−2) grams map-side; counting is one
    * map-side-combinable aggregate on the gram digest — the corpus
    * text shuffles as grams once, never as documents; the final top-K
    * is a sort-limit over the PRUNED count table (vocabulary-scale by
    * construction).
    */
  def ngramCounts(docs: DataFrame, minCount: Int = 3,
      topK: Int = 200): DataFrame = {
    val withToks = docs
      .select(tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
    withToks
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 3), i -> " +
          "concat_ws(' ', toks[i], toks[i+1], toks[i+2]))")).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >= minCount)
      .orderBy(col("n_occurrences").desc, col("gram"))
      .limit(topK)
  }

  val ngramCountsSql: String =
    """WITH t AS (
         SELECT string_split_regex(trim(text), ' +') AS toks
         FROM documents),
       g AS (
         SELECT unnest(list_transform(range(1, len(toks) - 1),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
         FROM t WHERE len(toks) >= 3)
       SELECT gram, COUNT(*) AS n_occurrences
       FROM g
       GROUP BY gram
       HAVING COUNT(*) >= 3
       ORDER BY n_occurrences DESC, gram
       LIMIT 200"""

  /** FILTER DECISIONS capstone — the per-document keep/reject verdict
    * a curation pipeline actually executes, composed from the
    * individual signals ([[textQuality]]'s length band,
    * repetition, [[textLexiconFilter]], [[textReadability]]) with a
    * FIXED adjudication order so the reject reason is deterministic:
    * the first failing filter names the rejection. Every predicate is
    * integer cross-multiplied (no float at any decision boundary), so
    * the verdicts — not just the scores — hash-match the oracle. One
    * scan, no shuffle; the audit trail (per-filter booleans + reason)
    * is what makes a 100 TB filtering run debuggable.
    */
  def filterDecisions(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("long")
    val nDistinct = size(array_distinct(toks)).cast("long")
    val nChars = length(col("text")).cast("long")
    val hits = size(array_intersect(tokens(lower(col("text"))),
      array(unsafeLexicon.map(lit): _*))).cast("long")
    val words = nTok
    val sentences = greatest(lit(1L),
      size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
        .cast("long"))
    val syllables = size(regexp_extract_all(lower(col("text")),
      lit("[aeiouy]+"), lit(0))).cast("long")
    val lengthOk = nChars >= 100 && nChars <= 4000
    val repetitionOk = nDistinct * 2 >= nTok // dup ratio < 0.5, exact
    val lexiconOk = !(hits * 1000 > nTok)
    val readabilityOk = !(syllables * 2 >= words * 3 ||
      words >= sentences * 30)
    docs.select(col("doc_id"),
        lengthOk.as("length_ok"), repetitionOk.as("repetition_ok"),
        lexiconOk.as("lexicon_ok"), readabilityOk.as("readability_ok"))
      .withColumn("keep", col("length_ok") && col("repetition_ok") &&
        col("lexicon_ok") && col("readability_ok"))
      .withColumn("reject_reason",
        when(!col("length_ok"), "length")
          .when(!col("repetition_ok"), "repetition")
          .when(!col("lexicon_ok"), "lexicon")
          .when(!col("readability_ok"), "readability")
          .otherwise(lit(null).cast("string")))
  }

  val filterDecisionsSql: String = {
    val lst = unsafeLexicon.map(w => s"'$w'").mkString(", ")
    s"""WITH sig AS (
         SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
             AS n_tok,
           CAST(len(list_distinct(string_split_regex(trim(text), ' +')))
             AS BIGINT) AS n_distinct,
           CAST(len(list_intersect(
             string_split_regex(trim(lower(text)), ' +'), [$lst]))
             AS BIGINT) AS hits,
           greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
             AS BIGINT)) AS n_sent,
           CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
             AS BIGINT) AS n_syll
         FROM documents),
       v AS (
         SELECT doc_id,
           n_chars >= 100 AND n_chars <= 4000 AS length_ok,
           n_distinct * 2 >= n_tok AS repetition_ok,
           NOT (hits * 1000 > n_tok) AS lexicon_ok,
           NOT (n_syll * 2 >= n_tok * 3 OR n_tok >= n_sent * 30)
             AS readability_ok
         FROM sig)
       SELECT doc_id, length_ok, repetition_ok, lexicon_ok,
         readability_ok,
         length_ok AND repetition_ok AND lexicon_ok AND readability_ok
           AS keep,
         CASE WHEN NOT length_ok THEN 'length'
              WHEN NOT repetition_ok THEN 'repetition'
              WHEN NOT lexicon_ok THEN 'lexicon'
              WHEN NOT readability_ok THEN 'readability'
         END AS reject_reason
       FROM v
       ORDER BY doc_id"""
  }

  /** TOKENIZER FERTILITY report per (lang, source) — the standard
    * tokenizer-evaluation metric (subword tokens per word; chars per
    * subword): a language whose fertility is high pays more sequence
    * length per word of content, which drives both training cost and
    * the data-mixing weights. Pure exact-count arithmetic (BIGINT sums
    * of the same per-doc token counts [[textTokens]] reports; the two
    * divisions are exact-parity IEEE doubles over exact sums), one
    * map-side-combinable aggregate over the corpus scan.
    */
  def tokenizerFertility(docs: DataFrame): DataFrame = {
    val words = size(tokens(col("text"))).cast("long")
    val subwords = bpeIshCount(col("text"))
    val chars = length(col("text")).cast("long")
    docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(words).cast("long").as("n_words"),
        sum(subwords).cast("long").as("n_subwords"),
        sum(chars).cast("long").as("n_chars"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_words"),
        col("n_subwords"), col("n_chars"),
        (col("n_subwords").cast("double") / col("n_words").cast("double"))
          .as("fertility"),
        (col("n_chars").cast("double") / col("n_subwords").cast("double"))
          .as("chars_per_subword"))
  }

  val tokenizerFertilitySql: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split_regex(trim(text), ' +'))) AS BIGINT)
         AS n_words,
       CAST(SUM(len(regexp_extract_all(text,
         '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]+'))) AS BIGINT) AS n_subwords,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars,
       CAST(SUM(len(regexp_extract_all(text,
           '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]+'))) AS DOUBLE)
         / CAST(SUM(len(string_split_regex(trim(text), ' +'))) AS DOUBLE)
         AS fertility,
       CAST(SUM(length(text)) AS DOUBLE)
         / CAST(SUM(len(regexp_extract_all(text,
             '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]+'))) AS DOUBLE)
         AS chars_per_subword
       FROM documents
       GROUP BY 1, 2
       ORDER BY 1, 2"""

  /** Quality scoring: length, repetition, stopword density, punctuation
    * — the standard cheap filters for pretraining corpora.
    */
  def textQuality(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val nDistinct = size(array_distinct(toks)).cast("double")
    val nChars = length(col("text")).cast("double")
    val stopHits = langScore(toks, langMarkers.head._2).cast("double")
    val punct = size(regexp_extract_all(col("text"),
      lit("[^A-Za-z0-9 ]"), lit(0))).cast("double")
    val repetition = lit(1.0) - nDistinct / nTok
    val stopRatio = stopHits / lit(5.0)
    val punctRatio = punct / nChars
    val lengthOk = (nChars >= 100 && nChars <= 4000).cast("double")
    docs.select(
      col("doc_id"),
      nTok.cast("long").as("n_tokens"),
      repetition.as("repetition"),
      stopRatio.as("stopword_score"),
      punctRatio.as("punct_ratio"),
      lengthOk.as("length_ok"),
      (lengthOk * lit(0.25) + (lit(1.0) - repetition) * lit(0.35) +
        stopRatio * lit(0.25) + (lit(1.0) - punctRatio) * lit(0.15))
        .as("quality_score"))
  }

  /** Shared oracle CTEs `t`→`m`→`quality` (per-doc quality metrics) —
    * the single definition of the score, reused by [[textQualitySql]]
    * and [[Clusters.canonicalDocsSql]] so the two cannot drift.
    */
  val textQualityCtesSql: String =
    """t AS (
         SELECT doc_id, text,
           string_split_regex(trim(text), ' +') AS toks,
           CAST(length(text) AS DOUBLE) AS n_chars
         FROM documents),
       m AS (
         SELECT doc_id,
           CAST(len(toks) AS DOUBLE) AS n_tok,
           CAST(len(list_distinct(toks)) AS DOUBLE) AS n_distinct,
           CAST(len(list_intersect(toks, ['the','and','of','is','to'])) AS DOUBLE) AS stop_hits,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE) AS punct,
           n_chars
         FROM t),
       quality AS (
         SELECT doc_id,
           CAST(n_tok AS BIGINT) AS n_tokens,
           1.0 - n_distinct / n_tok AS repetition,
           stop_hits / 5.0 AS stopword_score,
           punct / n_chars AS punct_ratio,
           CAST(n_chars >= 100 AND n_chars <= 4000 AS DOUBLE) AS length_ok,
           CAST(n_chars >= 100 AND n_chars <= 4000 AS DOUBLE) * 0.25
             + (1.0 - (1.0 - n_distinct / n_tok)) * 0.35
             + (stop_hits / 5.0) * 0.25
             + (1.0 - punct / n_chars) * 0.15 AS quality_score
         FROM m)"""

  val textQualitySql: String =
    s"""WITH $textQualityCtesSql
       SELECT doc_id, n_tokens, repetition, stopword_score, punct_ratio,
         length_ok, quality_score
       FROM quality
       ORDER BY doc_id"""

  /** Rolling-hash fingerprints via the native [[Fingerprint]] Catalyst
    * expression (FNV-1a 64): whole-doc fingerprint plus a fingerprint of
    * the normalized (lowercased, space-collapsed) text. Oracle-verified:
    * DuckDB reproduces the hash bit-exactly via a HUGEINT list_reduce
    * fold over the string's UTF-8 bytes (see [[fnvFoldSql]]).
    */
  def textFingerprint(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    docs.select(
      col("doc_id"),
      Fingerprint.fnv1a64(s, col("text")).as("fingerprint"),
      Fingerprint.fnv1a64(s, regexp_replace(lower(col("text")), " +", " "))
        .as("normalized_fingerprint"))
  }

  /** PII scrubbing for pretraining corpora: redact email-shaped and
    * phone-shaped spans (same regex dialect subset in Java regex and
    * RE2, so the oracle matches byte-for-byte). Pure per-row codegen'd
    * expressions — runs at scan speed.
    */
  def textPiiScrub(docs: DataFrame): DataFrame = {
    val scrubbed = regexp_replace(
      regexp_replace(col("text"),
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "\\+?[0-9][0-9()\\- ]{7,}[0-9]", "<PHONE>")
    docs.select(
      col("doc_id"),
      scrubbed.as("scrubbed_text"),
      (scrubbed =!= col("text")).as("was_scrubbed"))
  }

  val textPiiScrubSql: String =
    """SELECT doc_id,
       regexp_replace(
         regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '\+?[0-9][0-9()\- ]{7,}[0-9]', '<PHONE>', 'g') AS scrubbed_text,
       regexp_replace(
         regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '\+?[0-9][0-9()\- ]{7,}[0-9]', '<PHONE>', 'g') <> text AS was_scrubbed
       FROM documents
       ORDER BY doc_id"""

  /** Deterministic train/val/test split by content hash (fnv1a64 of the
    * normalized text, not doc_id, so the split survives re-ingestion
    * with different ids — the standard trick for stable corpus splits).
    * 90/5/5. Oracle-verified via the DuckDB FNV fold; proportions and
    * determinism additionally asserted in ScalaTest.
    */
  def corpusSplit(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    val bucket = pmod(
      Fingerprint.fnv1a64(s, regexp_replace(lower(trim(col("text"))), " +", " ")),
      lit(100L))
    docs.select(
      col("doc_id"), col("lang"),
      when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
        .as("split"))
  }

  /** Deterministic k-sample of documents per language via the native
    * `hash_sample` TypedImperativeAggregate (k-min-hash sampling —
    * partition-order independent, k-bounded partials). Oracle-verified:
    * the ordering hash is FNV-1a 64, which DuckDB re-derives exactly, so
    * the oracle is a row_number-over-(hash, value) window; invariants
    * (determinism, bound, subset) additionally in ScalaTest.
    */
  def docsSamplePerLang(docs: DataFrame, k: Int = 3): DataFrame = {
    val s = docs.sparkSession
    // fallback registration for sessions built without GraftExtensions
    // (idempotent: always registers the same definition)
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hash_sample",
      exprs => graft.functions.HashSample(
        exprs.head,
        exprs(1).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
          .value.toString.toInt).toAggregateExpression(),
      "built-in")
    // unique per-call view name: the fixed-name alternative races across
    // threads sharing a session; SQL analyzes eagerly, so dropping the
    // view afterwards does not invalidate the returned plan
    val view = s"graft_docs_sample_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    docs.createOrReplaceTempView(view)
    try s.sql(
      s"""SELECT lang, hash_sample(CAST(doc_id AS STRING), $k) AS sample_ids,
         COUNT(*) AS group_size
         FROM $view GROUP BY lang""")
    finally s.catalog.dropTempView(view)
  }

  /** Corpus report card: per (source, lang) doc counts, exact token and
    * char totals, and distinct-content counts (the dedup-pressure
    * signal) — the gold-layer rollup a data curator reads before
    * deciding mixture weights. One groupBy with map-side combine; the
    * distinct count shuffles md5 digests (32 bytes/doc), never the
    * texts themselves. At 100 TB the exact distinct becomes the HLL
    * sketch ([[graft.operators.Analytics]] events_approx_users shows
    * that pattern); everything else stays as-is.
    */
  def corpusSourceStats(docs: DataFrame): DataFrame = docs
    .groupBy(col("source"), col("lang"))
    .agg(
      count(lit(1)).cast("long").as("n_docs"),
      countDistinct(md5(col("text"))).cast("long").as("distinct_texts"),
      sum(size(tokens(col("text")))).cast("long").as("total_ws_tokens"),
      sum(length(col("text"))).cast("long").as("total_chars"),
      max(length(col("text"))).cast("long").as("max_chars"))
    .withColumn("dup_ratio", lit(1.0) -
      col("distinct_texts").cast("double") / col("n_docs").cast("double"))
    .withColumn("avg_tokens",
      col("total_ws_tokens").cast("double") / col("n_docs").cast("double"))

  val corpusSourceStatsSql: String =
    """SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS distinct_texts,
       CAST(SUM(len(string_split_regex(trim(text), ' +'))) AS BIGINT)
         AS total_ws_tokens,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(MAX(length(text)) AS BIGINT) AS max_chars,
       1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS dup_ratio,
       CAST(SUM(len(string_split_regex(trim(text), ' +'))) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_tokens
       FROM documents
       GROUP BY 1, 2
       ORDER BY 1, 2"""

  /** Duplicate-bigram repetition stats — the n-gram tier of the
    * Gopher/RefinedWeb repetition rules (duplicated n-gram fraction and
    * most-common-n-gram share), one level above [[textQuality]]'s
    * distinct-WORD ratio: a doc that alternates two phrases has near-1
    * word diversity but pathological bigram repetition. Shape is
    * explode → (doc, gram) count → per-doc agg: map-side combine keeps
    * the shuffle at Σ distinct grams, and nothing is quadratic in doc
    * length, so the plan survives book-length documents. Ratios are
    * per-row double division of exact BIGINTs — deterministic on both
    * engines (only double *reductions* diverge).
    */
  def ngramRepetition(docs: DataFrame): DataFrame = {
    val grams = docs
      .select(col("doc_id"), split(Dedup.normText(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= 2) // sequence(0,-1) would DESCEND
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2)," +
          " i -> concat(toks[i], ' ', toks[i + 1]))")).as("gram"))
    grams.groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).cast("long").as("n_bigrams"),
        count(lit(1)).cast("long").as("n_distinct_bigrams"),
        max(col("c")).cast("long").as("top_bigram_count"),
        sum(when(col("c") > 1, col("c")).otherwise(lit(0L)))
          .cast("long").as("dup_bigram_tokens"))
      .withColumn("dup_fraction",
        col("dup_bigram_tokens").cast("double") / col("n_bigrams").cast("double"))
      .withColumn("top_share",
        col("top_bigram_count").cast("double") / col("n_bigrams").cast("double"))
  }

  val ngramRepetitionSql: String =
    """WITH toks AS (
         SELECT doc_id, string_split(
           regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' ') AS t
         FROM documents),
       grams AS (
         SELECT doc_id, unnest(list_transform(
           generate_series(1, len(t) - 1),
           i -> t[i] || ' ' || t[i + 1])) AS gram
         FROM toks WHERE len(t) >= 2),
       counts AS (
         SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2)
       SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_bigrams,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams,
         CAST(MAX(c) AS BIGINT) AS top_bigram_count,
         CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
           AS dup_bigram_tokens,
         CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
           / CAST(SUM(c) AS DOUBLE) AS dup_fraction,
         CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_share
       FROM counts
       GROUP BY doc_id
       ORDER BY doc_id"""

  /** Vocabulary encoding — the tokenize→ids step before packing: rank
    * the corpus vocabulary by collection frequency (ties broken by
    * token text, so the id assignment is a deterministic total order)
    * and rewrite each document as its token-id sequence. The id window
    * runs over VOCABULARY rows (frequency-ranked id tables are
    * vocab-sized even at 100 TB, and the single-partition window is the
    * standard price of a global ranking); the corpus-sized work — the
    * explode and the token→id join — broadcasts the vocab and never
    * shuffles the corpus. Ids are emitted as a '-'-joined string:
    * array output would break the driver's row-hash compare, and the
    * join proves content parity without shipping arrays.
    */
  def corpusEncode(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      posexplode(split(Dedup.normText(col("text")), " ")).as(Seq("pos", "tok")))
    val vocab = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("cf"))
      .withColumn("id", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cf").desc, col("tok"))))
    toks.join(broadcast(vocab.select(col("tok"), col("id"))), Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("long").as("n_tokens"),
        concat_ws("-",
          transform(
            array_sort(collect_list(struct(col("pos"), col("id")))),
            x => x.getField("id").cast("string"))).as("ids_csv"))
  }

  val corpusEncodeSql: String =
    """WITH docs_n AS (
         SELECT doc_id, string_split(
           regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' ') AS toks
         FROM documents),
       freq AS (
         SELECT tok, COUNT(*) AS cf
         FROM (SELECT unnest(toks) AS tok FROM docs_n)
         GROUP BY tok),
       vocab AS (
         SELECT tok, row_number() OVER (ORDER BY cf DESC, tok) AS id
         FROM freq),
       pos AS (
         SELECT doc_id, i AS pos, toks[i] AS tok
         FROM docs_n, unnest(generate_series(1, len(toks))) AS g(i)),
       enc AS (
         SELECT p.doc_id, p.pos, v.id FROM pos p JOIN vocab v USING (tok))
       SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         string_agg(CAST(id AS VARCHAR), '-' ORDER BY pos) AS ids_csv
       FROM enc
       GROUP BY doc_id
       ORDER BY doc_id"""

  /** Corpus vocabulary statistics: per-token document frequency and
    * collection frequency over whitespace tokens of the normalized
    * text — the df/cf table behind tokenizer-vocab builds and
    * df-based quality filters. One explode + one groupBy: map-side
    * combine keeps the shuffle at vocabulary size, not corpus size.
    */
  def corpusVocab(docs: DataFrame, minDf: Int = 5): DataFrame = docs
    .select(col("doc_id"),
      explode(split(Dedup.normText(col("text")), " ")).as("tok"))
    .groupBy(col("tok"))
    .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("cf"))
    .filter(col("df") >= minDf)

  val corpusVocabSql: String =
    """SELECT tok,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
       CAST(COUNT(*) AS BIGINT) AS cf
       FROM (SELECT doc_id,
               unnest(string_split(
                 regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' ')) AS tok
             FROM documents)
       GROUP BY tok
       HAVING COUNT(DISTINCT doc_id) >= 5
       ORDER BY tok"""

  /** Inverted index with BOUNDED posting lists: token → document
    * frequency + the `maxPostings` smallest doc_ids (and a has_more
    * flag) — the search/debug sidecar of a dedup pipeline ("which docs
    * contain this token"). The cap is enforced with a rank window
    * BEFORE collect_list, so per-token aggregation state is
    * O(maxPostings) regardless of how hot the token is — the unbounded
    * collect-then-slice shape would OOM on stopwords at 100 TB.
    */
  def invertedIndex(docs: DataFrame, minDf: Int = 3,
      maxPostings: Int = 20): DataFrame = {
    val exploded = docs.select(col("doc_id"),
      explode(array_distinct(split(Dedup.normText(col("text")), " ")))
        .as("token"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token")).orderBy(col("doc_id"))
    exploded
      .withColumn("rn", row_number().over(w))
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("df"),
        array_join(transform(
          sort_array(collect_list(when(col("rn") <= maxPostings,
            col("doc_id")))),
          _.cast("string")), ",").as("postings"))
      .filter(col("df") >= minDf)
      .select(col("token"), col("df"), col("postings"),
        (col("df") > maxPostings).as("has_more"))
  }

  val invertedIndexSql: String =
    """WITH tok AS (
         SELECT doc_id,
           unnest(list_distinct(string_split(
             regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' '))) AS token
         FROM documents),
       ranked AS (
         SELECT token, doc_id,
           row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
         FROM tok)
       SELECT token,
         COUNT(*) AS df,
         array_to_string(list_sort(list(doc_id) FILTER (rn <= 20)), ',')
           AS postings,
         COUNT(*) > 20 AS has_more
       FROM ranked
       GROUP BY token
       HAVING COUNT(*) >= 3
       ORDER BY token"""

  /** Overlapping token-window chunking — the sharding step for context
    * windows (RAG indexing / long-doc pretraining): each document's
    * token stream becomes windows of `ChunkSize` tokens starting every
    * `ChunkStride` (so consecutive chunks overlap by size − stride).
    * One explode over a `sequence()` of window starts — fan-out is
    * ceil(len/stride) rows per doc, no shuffle at all until a consumer
    * aggregates. Chunks are emitted as (count, fingerprint), not text:
    * the fingerprint proves content parity in the gate without shipping
    * megabytes of repeated text through the compare.
    */
  def chunkDocs(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    docs
      .select(col("doc_id"),
        split(Dedup.normText(col("text")), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0),
          expr(s"(size(toks) - 1) div $ChunkStride"))).as("chunk_idx"))
      .withColumn("ctoks",
        slice(col("toks"), col("chunk_idx") * ChunkStride + 1, lit(ChunkSize)))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size(col("ctoks")).cast("long").as("n_tokens"),
        Fingerprint.fnv1a64(s, concat_ws(" ", col("ctoks"))).as("chunk_fp"))
  }

  // window sized to the fixture's 10-99-token docs so multi-chunk
  // overlap is actually exercised; production contexts use e.g. 256/192
  val ChunkSize = 32
  val ChunkStride = 24

  val chunkDocsSql: String = {
    s"""WITH t AS (
         SELECT doc_id,
           string_split(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' ')
             AS toks
         FROM documents),
       c AS (
         SELECT doc_id, toks,
           unnest(range(0, ((len(toks) - 1) // $ChunkStride) + 1)) AS chunk_idx
         FROM t),
       s AS (
         SELECT doc_id, chunk_idx,
           list_slice(toks, chunk_idx * $ChunkStride + 1,
             chunk_idx * $ChunkStride + $ChunkSize) AS ctoks
         FROM c),
       x AS (
         SELECT doc_id, chunk_idx, len(ctoks) AS n_tokens,
           array_to_string(ctoks, ' ') AS ctext
         FROM s)
       SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         CAST(n_tokens AS BIGINT) AS n_tokens,
         ${OracleFnv.ofText("ctext")} AS chunk_fp
       FROM x
       ORDER BY doc_id, chunk_idx"""
  }

  /** Rare-token document scoring — the tf·idf-family quality signal
    * pretraining filters use (documents dominated by ultra-common
    * tokens score low; documents carrying rare vocabulary score high).
    * The idf is the RATIONAL form scaled to integers,
    * `idf(t) = (N · 10^6) div df(t)`, so the whole computation stays in
    * exact BIGINT arithmetic — no transcendental log whose last-ulp
    * differences between runtimes would break hash parity, and no
    * float reduction at all.
    *
    * Plan shape: explode → (doc,tok) tf agg → tok df agg → sort-merge
    * join on tok (the vocab is corpus-sized at 100 TB — never assume it
    * broadcasts) → per-doc sum. All four shuffles are linear in the
    * token stream; the one-row corpus total joins by broadcast.
    */
  def rarityScore(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(Dedup.normText(col("text")), " ")).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = toks.groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val total = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(total)) // one row: the corpus size
      .withColumn("idf_scaled", expr("n_docs * 1000000L div df"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("idf_scaled")).as("rarity_score"),
        sum(col("tf")).as("n_toks"))
  }

  val rarityScoreSql: String =
    """WITH toks AS (
         SELECT doc_id,
           unnest(string_split(
             regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' ')) AS tok
         FROM documents),
       tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
       dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
       total AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
       SELECT tf.doc_id,
         CAST(SUM(tf.tf * ((t.n_docs * 1000000) // dfreq.df)) AS BIGINT)
           AS rarity_score,
         CAST(SUM(tf.tf) AS BIGINT) AS n_toks
       FROM tf
       JOIN dfreq ON tf.tok = dfreq.tok
       CROSS JOIN total t
       GROUP BY tf.doc_id
       ORDER BY tf.doc_id"""

  /** Deterministic sequence packing: assign docs to fixed-token-budget
    * packs by running token count within a language, in doc_id order —
    * the batch-shape step before writing training shards. A single
    * window (one shuffle + sort per lang partition); no driver loop.
    * Greedy bin packing would need per-bin state; the running-sum form
    * is the order-preserving variant production packers use when shard
    * order must be stable.
    */
  def packDocs(docs: DataFrame, budgetTokens: Int = 2048): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs
      .select(col("doc_id"), col("lang"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("tokens_before",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("pack_id", expr(s"tokens_before div $budgetTokens"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("pack_id"))
  }

  val packDocsSql: String =
    """WITH t AS (
         SELECT doc_id, lang,
           CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens
         FROM documents),
       c AS (
         SELECT doc_id, lang, n_tokens,
           CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS tokens_before
         FROM t)
       SELECT doc_id, lang, n_tokens, tokens_before // 2048 AS pack_id
       FROM c
       ORDER BY doc_id"""

  /** End-to-end corpus cleaning — the composition a training-data
    * pipeline actually runs, as ONE declarative plan: keep a document
    * iff it is (a) the keeper of its exact-duplicate group (min doc_id
    * per normalized-content hash), (b) within the length gate, and
    * (c) in the train split. Each stage is an operator verified on its
    * own elsewhere in the gate; this query verifies their composition.
    * One aggregation (dedup groups) + one broadcast-able join back —
    * the whole filter runs at scan speed otherwise.
    */
  def corpusClean(docs: DataFrame): DataFrame = {
    val norm = Dedup.normText(col("text"))
    val keyed = docs.select(col("doc_id"), col("lang"),
      length(col("text")).cast("long").as("n_chars"),
      md5(norm).as("content_key"))
    val keepers = keyed.groupBy(col("content_key"))
      .agg(min(col("doc_id")).as("doc_id"))
    val split = corpusSplit(docs).select(col("doc_id"), col("split"))
    keyed.join(keepers, Seq("content_key", "doc_id")) // semi: keeper rows
      .join(split, "doc_id")
      .filter(col("n_chars") >= 100 && col("n_chars") <= 4000 &&
        col("split") === "train")
      .select(col("doc_id"), col("lang"), col("n_chars"), col("split"))
  }

  // lazy: splitCtesSql is declared later in the object, and a plain
  // val would interpolate its uninitialized (null) value
  lazy val corpusCleanSql: String =
    s"""WITH $splitCtesSql,
        keyed AS (
          SELECT doc_id, lang,
            CAST(length(text) AS BIGINT) AS n_chars,
            md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g'))
              AS content_key
          FROM documents),
        keepers AS (
          SELECT content_key, MIN(doc_id) AS doc_id
          FROM keyed GROUP BY content_key)
        SELECT k.doc_id, k.lang, k.n_chars, s.split
        FROM keyed k
        JOIN keepers USING (content_key, doc_id)
        JOIN split_docs s ON s.doc_id = k.doc_id
        WHERE k.n_chars >= 100 AND k.n_chars <= 4000 AND s.split = 'train'
        ORDER BY k.doc_id"""

  /** JSONL corpus export — the interchange step at the end of a
    * training-data pipeline: the cleaned corpus is sharded as
    * lang-partitioned JSON-lines files (the format tokenizer/training
    * jobs consume) and read back; the registered output carries the
    * FNV fingerprint of each round-tripped text, so the oracle proves
    * the export is byte-lossless through JSON escaping/encoding, not
    * just row-complete. One shuffle (partition clustering); export IO
    * is the dominant cost by design.
    */
  def corpusExportJsonl(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val path = graft.sources.Scratch.dir("jsonl")
    docs.join(corpusClean(docs).select(col("doc_id")), "doc_id")
      .select(col("doc_id"), col("lang"), col("text"))
      .repartition(col("lang")) // one writer task per shard partition
      .write.partitionBy("lang").json(path)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType)))
    spark.read.schema(schema).json(path)
      .select(col("doc_id"), col("lang"),
        Fingerprint.fnv1a64(spark, col("text")).as("text_fp"))
  }

  lazy val corpusExportJsonlSql: String =
    s"""WITH cleaned AS ($corpusCleanSql)
       SELECT d.doc_id, d.lang, ${OracleFnv.ofText("d.text")} AS text_fp
       FROM documents d
       JOIN cleaned c ON d.doc_id = c.doc_id
       ORDER BY d.doc_id"""

  /** Deterministic source-mix sampling — the pretraining "data mixing"
    * step: each source contributes a hash-gated fraction of its docs
    * (weight 1.0 = keep all, 0.25 = keep ~quarter). The gate is
    * u(doc) < w(source) with u = fnv1a64("mix:"+doc_id) scaled to
    * [0, 1), so the sample is exactly reproducible (no RNG, no
    * sampleBy), a doc's fate is stable as the corpus grows, and raising
    * a weight only ADDS docs (nested samples — the property mix tuning
    * relies on). Scan-only: one filter, no shuffle.
    */
  def mixSample(docs: DataFrame, weights: Map[String, Double],
      defaultWeight: Double): DataFrame = {
    val wMap = typedlit(weights)
    docs
      .withColumn("__u",
        pmod(graft.functions.Fingerprint.fnv1a64(docs.sparkSession,
          concat(lit("mix:"), col("doc_id").cast("string"))), lit(1000000L))
          .cast("double") / 1000000.0)
      .filter(col("__u") < coalesce(element_at(wMap, col("source")),
        lit(defaultWeight)))
      .drop("__u")
  }

  /** Registered mix: boost src1 down-weighted tiers mirrored in SQL. */
  val MixWeights: Map[String, Double] =
    Map("src0" -> 1.0, "src1" -> 0.35, "src2" -> 0.75, "src3" -> 0.1)
  val MixDefault: Double = 0.5

  val mixSampleSql: String = {
    val cases = MixWeights.toSeq.sorted
      .map { case (s, w) => s"WHEN '$s' THEN $w" }.mkString(" ")
    s"""SELECT doc_id, source, lang, n_chars FROM documents
       WHERE CAST(((${OracleFnv.ofText("'mix:' || CAST(doc_id AS VARCHAR)")} % 1000000)
                   + 1000000) % 1000000 AS DOUBLE) / 1000000.0
             < CASE source $cases ELSE $MixDefault END
       ORDER BY doc_id"""
  }

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_chunks" -> ((s, d) =>
      chunkDocs(Tables.documents(s, d))
        .orderBy(col("doc_id"), col("chunk_idx"))),
    "text_rarity_score" -> ((s, d) =>
      rarityScore(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "corpus_export_jsonl" -> ((s, d) =>
      corpusExportJsonl(s, d).orderBy(col("doc_id"))),
    "corpus_mix_sample" -> ((s, d) =>
      mixSample(Tables.documents(s, d), MixWeights, MixDefault)
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))),
    // sample_ids emitted as a sorted CSV string, not ARRAY<STRING>: the
    // driver's compare sorts/hashes output values and cannot handle
    // nested types (observed r1: pandas "unhashable type" crash)
    "docs_sample_per_lang" -> ((s, d) =>
      docsSamplePerLang(Tables.documents(s, d))
        .select(col("lang"),
          array_join(sort_array(col("sample_ids")), ",").as("sample_ids"),
          col("group_size"))
        .orderBy(col("lang"))),
    "corpus_split" -> ((s, d) =>
      corpusSplit(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "text_pii_scrub" -> ((s, d) =>
      textPiiScrub(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "text_langid" -> ((s, d) =>
      textLangId(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "text_tokens" -> ((s, d) =>
      textTokens(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "corpus_tokenizer_fertility" -> ((s, d) =>
      tokenizerFertility(Tables.documents(s, d))
        .orderBy(col("lang"), col("source"))),
    "text_lexicon_filter" -> ((s, d) =>
      textLexiconFilter(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "text_readability" -> ((s, d) =>
      textReadability(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "corpus_filter_decisions" -> ((s, d) =>
      filterDecisions(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "corpus_ngram_counts" -> ((s, d) =>
      ngramCounts(Tables.documents(s, d))),
    "text_quality" -> ((s, d) =>
      textQuality(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "text_fingerprint" -> ((s, d) =>
      textFingerprint(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "text_ngram_repetition" -> ((s, d) =>
      ngramRepetition(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "corpus_source_stats" -> ((s, d) =>
      corpusSourceStats(Tables.documents(s, d))
        .orderBy(col("source"), col("lang"))),
    "corpus_vocab" -> ((s, d) =>
      corpusVocab(Tables.documents(s, d)).orderBy(col("tok"))),
    "docs_inverted_index" -> ((s, d) =>
      invertedIndex(Tables.documents(s, d)).orderBy(col("token"))),
    "corpus_encode" -> ((s, d) =>
      corpusEncode(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "corpus_pack" -> ((s, d) =>
      packDocs(Tables.documents(s, d)).orderBy(col("doc_id"))),
    "corpus_clean" -> ((s, d) =>
      corpusClean(Tables.documents(s, d)).orderBy(col("doc_id"))))

  // ---- DuckDB FNV-1a 64 mirror (shared fragments in OracleFnv) -------------
  private def fnvFoldSql(hexCol: String): String = OracleFnv.fold(hexCol)
  private def fnvSignedSql(h: String): String = OracleFnv.signed(h)

  val textFingerprintSql: String =
    s"""WITH x AS (
          SELECT doc_id,
            hex(encode(text)) AS hx1,
            hex(encode(regexp_replace(lower(text), ' +', ' ', 'g'))) AS hx2
          FROM documents),
        f AS (
          SELECT doc_id,
            ${fnvFoldSql("hx1")} AS h1,
            ${fnvFoldSql("hx2")} AS h2
          FROM x)
        SELECT doc_id,
          ${fnvSignedSql("h1")} AS fingerprint,
          ${fnvSignedSql("h2")} AS normalized_fingerprint
        FROM f
        ORDER BY doc_id"""

  /** Shared oracle CTEs ending in `split_docs(doc_id, lang, toks,
    * split)` — the single definition of the content-hash 90/5/5 split,
    * reused by [[corpusSplitSql]] and [[Decontaminate.contaminationSql]]
    * so the two oracles cannot drift.
    */
  val splitCtesSql: String = {
    val norm = "regexp_replace(lower(trim(text)), ' +', ' ', 'g')"
    s"""split_nrm AS (
          SELECT doc_id, lang,
            string_split($norm, ' ') AS toks,
            hex(encode($norm)) AS hx
          FROM documents),
        split_f AS (
          SELECT doc_id, lang, toks, ${fnvFoldSql("hx")} AS h
          FROM split_nrm),
        split_docs AS (
          SELECT doc_id, lang, toks,
            CASE WHEN bucket < 90 THEN 'train'
                 WHEN bucket < 95 THEN 'val'
                 ELSE 'test' END AS split
          FROM (SELECT doc_id, lang, toks,
                  ((${fnvSignedSql("h")} % 100) + 100) % 100 AS bucket
                FROM split_f))"""
  }

  val corpusSplitSql: String =
    s"""WITH $splitCtesSql
        SELECT doc_id, lang, split FROM split_docs
        ORDER BY doc_id"""

  val docsSamplePerLangSql: String =
    s"""WITH d AS (
          SELECT lang, CAST(doc_id AS VARCHAR) AS id FROM documents),
        x AS (SELECT lang, id, hex(encode(id)) AS hx FROM d),
        f AS (SELECT lang, id, ${fnvSignedSql(fnvFoldSql("hx"))} AS fp FROM x),
        r AS (
          SELECT lang, id,
            row_number() OVER (PARTITION BY lang ORDER BY fp, id) AS rn
          FROM f)
        SELECT lang,
          array_to_string(list_sort(list(id) FILTER (WHERE rn <= 3)), ',')
            AS sample_ids,
          CAST(COUNT(*) AS BIGINT) AS group_size
        FROM r
        GROUP BY lang
        ORDER BY lang"""

  def oracles: Map[String, String] = Map(
    "corpus_chunks" -> chunkDocsSql,
    "text_rarity_score" -> rarityScoreSql,
    "corpus_export_jsonl" -> corpusExportJsonlSql,
    "corpus_mix_sample" -> mixSampleSql,
    "text_pii_scrub" -> textPiiScrubSql,
    "text_langid" -> textLangIdSql,
    "text_tokens" -> textTokensSql,
    "corpus_tokenizer_fertility" -> tokenizerFertilitySql,
    "text_lexicon_filter" -> textLexiconFilterSql,
    "text_readability" -> textReadabilitySql,
    "corpus_filter_decisions" -> filterDecisionsSql,
    "corpus_ngram_counts" -> ngramCountsSql,
    "text_quality" -> textQualitySql,
    "text_fingerprint" -> textFingerprintSql,
    "corpus_split" -> corpusSplitSql,
    "docs_sample_per_lang" -> docsSamplePerLangSql,
    "text_ngram_repetition" -> ngramRepetitionSql,
    "corpus_source_stats" -> corpusSourceStatsSql,
    "corpus_vocab" -> corpusVocabSql,
    "docs_inverted_index" -> invertedIndexSql,
    "corpus_encode" -> corpusEncodeSql,
    "corpus_pack" -> packDocsSql,
    "corpus_clean" -> corpusCleanSql)
}
