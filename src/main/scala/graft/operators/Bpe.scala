package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed BPE-style tokenizer training — the merge-table learning
  * step of an LLM data pipeline, run as pure DataFrame ops:
  *
  *  1. corpus → distinct words with occurrence weights (one shuffle);
  *  2. words → (word, weight, pos, tok) char-token table;
  *  3. per round: count adjacent pairs (weighted, overlapping — the
  *     standard BPE count), pick the most frequent pair
  *     (count-desc, then lexicographic tiebreak → deterministic), and
  *     apply it LEFT-TO-RIGHT NON-OVERLAPPING to every word.
  *
  * The non-overlap apply needs no sequential fold: overlapping matches
  * can only chain when left = right (runs of one repeated token), so
  * "merge the 1st, 3rd, 5th… match of each consecutive run" — a
  * gaps-and-islands window (run id = pos − cumulative match count,
  * offset parity within the run) — reproduces the sequential result
  * exactly. That keeps every step a window/groupBy over (word) and
  * makes the whole computation expressible in the DuckDB oracle as
  * plain SQL windows, unrolled per round like the IVF k-means oracle.
  *
  * Scale: pair counting is explode + map-side-combinable agg; the apply
  * is three windows partitioned by word (one exchange, reused); the
  * only driver data is the per-round argmax pair — model state, one row
  * per round. Rounds are lineage-flattened with localCheckpoint.
  */
object Bpe {

  val Rounds = 4

  /** (word, w) → exploded char tokens (word, w, pos, tok), pos 1-based. */
  def charTokens(words: DataFrame): DataFrame = words
    .select(col("word"), col("w"),
      posexplode(expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))")))
    .select(col("word"), col("w"), (col("pos") + 1).as("pos"),
      col("col").as("tok"))

  /** One non-overlapping left-to-right merge application of (l, r). */
  def applyMerge(toks: DataFrame, l: String, r: String): DataFrame = {
    val byWord = Window.partitionBy(col("word")).orderBy(col("pos"))
    val withNext = toks.withColumn("nxt", lead(col("tok"), 1).over(byWord))
    val matched = withNext.withColumn("m",
      col("tok") === lit(l) && col("nxt") === lit(r))
    // islands: run id = pos - cumulative match count (constant within a
    // consecutive match run, distinct across runs); merge at even
    // offsets from the run start = the sequential non-overlap choice
    val grouped = matched
      .withColumn("grp",
        when(col("m"), col("pos") - sum(when(col("m"), 1).otherwise(0))
          .over(byWord)))
    val runStart = Window.partitionBy(col("word"), col("grp"))
    val merged = grouped
      .withColumn("merge_here",
        col("m") && (col("pos") - min(col("pos")).over(runStart)) % 2 === 0)
      .withColumn("consumed",
        coalesce(lag(col("merge_here"), 1).over(byWord), lit(false)))
      .filter(col("merge_here") || !col("consumed"))
      .select(col("word"), col("w"),
        row_number().over(byWord).as("pos"),
        when(col("merge_here"), lit(l + r)).otherwise(col("tok")).as("tok"))
    merged
  }

  /** The shared training loop: runs `rounds` greedy rounds and returns
    * the final token table plus the learned merge rows. Stops early if
    * a round finds no adjacent pair at all (merge-exhausted corpus) —
    * the oracle's LIMIT-1 CTE goes empty for that round and its apply
    * is the identity, so both sides agree on the truncated table.
    */
  private def train(docs: DataFrame,
      rounds: Int): (DataFrame, Seq[(Int, String, String, String, Long)]) = {
    val words = docs
      .select(explode(split(Dedup.normText(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("w"))
    // lineage flattened per round; the checkpointed RDDs are released
    // by Caching.releaseAll / GC like the Clusters propagation rounds
    var toks = charTokens(words).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var exhausted = false
    (1 to rounds).foreach { round =>
      if (!exhausted) {
        val byWord = Window.partitionBy(col("word")).orderBy(col("pos"))
        val best = toks
          .withColumn("nxt", lead(col("tok"), 1).over(byWord))
          .filter(col("nxt").isNotNull)
          .groupBy(col("tok"), col("nxt"))
          .agg(sum(col("w")).as("cnt"))
          .orderBy(col("cnt").desc, col("tok"), col("nxt"))
          .take(1) // model state: the argmax pair of this round
        best.headOption match {
          case None => exhausted = true
          case Some(b) =>
            val (l, r, cnt) = (b.getString(0), b.getString(1), b.getLong(2))
            merges += ((round, l, r, l + r, cnt))
            toks = applyMerge(toks, l, r).localCheckpoint()
        }
      }
    }
    (toks, merges.toSeq)
  }

  /** Train `rounds` merges; returns (round, left, right, merged,
    * pair_count) — the learned merge table, one row per round.
    */
  def bpeMerges(docs: DataFrame, rounds: Int = Rounds): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, rounds)._2
      .toDF("round", "left", "right", "merged", "pair_count")
  }

  /** Shared WITH-prefix of the BPE oracles: the `rounds` training
    * rounds unrolled as window-SQL CTEs — pair counts, deterministic
    * argmax (b$i), islands-parity merge application, and the next
    * round's token table (t${i+1}). Composed by [[bpeMergesSql]] and
    * [[bpeVocabSql]] so encode cannot drift from training.
    */
  private def trainingCtesSql(rounds: Int): String = {
    val norm = "regexp_replace(lower(trim(text)), ' +', ' ', 'g')"
    def roundCtes(i: Int): String =
      s"""p$i AS (
           SELECT word, w, pos, tok,
             lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt
           FROM t$i),
         b$i AS (
           SELECT tok AS l, nxt AS r, CAST(SUM(w) AS BIGINT) AS cnt
           FROM p$i WHERE nxt IS NOT NULL
           GROUP BY 1, 2
           ORDER BY cnt DESC, l, r
           LIMIT 1),
         m$i AS (
           SELECT word, w, pos, tok,
             tok = (SELECT l FROM b$i) AND nxt = (SELECT r FROM b$i) AS m
           FROM p$i),
         g$i AS (
           SELECT *, CASE WHEN m THEN pos - SUM(CASE WHEN m THEN 1 ELSE 0 END)
             OVER (PARTITION BY word ORDER BY pos) END AS grp
           FROM m$i),
         e$i AS (
           SELECT *,
             m AND (pos - MIN(pos) OVER (PARTITION BY word, grp)) % 2 = 0
               AS merge_here
           FROM g$i),
         k$i AS (
           SELECT *, COALESCE(lag(merge_here)
             OVER (PARTITION BY word ORDER BY pos), false) AS consumed
           FROM e$i),
         t${i + 1} AS (
           SELECT word, w,
             row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
             CASE WHEN merge_here
               THEN (SELECT l FROM b$i) || (SELECT r FROM b$i)
               ELSE tok END AS tok
           FROM k$i
           WHERE merge_here OR NOT consumed)"""
    s"""WITH words AS (
         SELECT word, COUNT(*) AS w
         FROM (SELECT unnest(string_split($norm, ' ')) AS word FROM documents)
         WHERE word <> ''
         GROUP BY word),
       t1 AS (
         SELECT word, w, CAST(i AS BIGINT) AS pos, substr(word, i, 1) AS tok
         FROM words, unnest(range(1, length(word) + 1)) AS u(i)),
       ${(1 to rounds).map(roundCtes).mkString(",\n       ")}"""
  }

  def bpeMergesSql(rounds: Int = Rounds): String = {
    val unions = (1 to rounds).map(i =>
      s"SELECT $i AS round, l AS \"left\", r AS \"right\", l || r AS merged, cnt AS pair_count FROM b$i")
      .mkString("\n       UNION ALL\n       ")
    s"""${trainingCtesSql(rounds)}
       SELECT * FROM (
       $unions)
       ORDER BY round"""
  }

  /** Post-merge vocabulary — the ENCODE side of the trained tokenizer:
    * re-train the merges (deterministic, same argmax path) and report
    * the corpus token distribution AFTER applying them: one row per
    * surviving token with its weighted frequency and whether it is a
    * learned merge product. The composition proves the merge table
    * round-trips: training and encoding agree on the final token
    * stream.
    */
  def bpeVocab(docs: DataFrame, rounds: Int = Rounds,
      minCount: Int = 50): DataFrame = {
    val (toks, merges) = train(docs, rounds)
    val learned = merges.map(_._4)
    toks.groupBy(col("tok"))
      .agg(sum(col("w")).as("token_count"))
      .filter(col("token_count") >= minCount)
      .select(col("tok").as("token"), col("token_count"),
        col("token").isin(learned.toSeq: _*).as("is_merged"))
  }

  /** Oracle for `corpus_bpe_vocab`: the training CTEs' FINAL token
    * table (t{rounds+1}) aggregated — shared verbatim with
    * [[bpeMergesSql]]'s round unrolling so encode cannot drift from
    * training.
    */
  def bpeVocabSql(rounds: Int = Rounds, minCount: Int = 50): String = {
    val merged = (1 to rounds)
      .map(i => s"SELECT l || r AS m FROM b$i").mkString(" UNION ALL ")
    s"""${trainingCtesSql(rounds)}
       SELECT tok AS token,
         CAST(SUM(w) AS BIGINT) AS token_count,
         tok IN (SELECT m FROM ($merged)) AS is_merged
       FROM t${rounds + 1}
       GROUP BY tok
       HAVING SUM(w) >= $minCount
       ORDER BY token"""
  }

  // ---- registry ------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_bpe_merges" -> ((s, d) =>
      bpeMerges(Tables.documents(s, d)).orderBy(col("round"))),
    "corpus_bpe_vocab" -> ((s, d) =>
      bpeVocab(Tables.documents(s, d)).orderBy(col("token"))))

  def oracles: Map[String, String] = Map(
    "corpus_bpe_merges" -> bpeMergesSql(),
    "corpus_bpe_vocab" -> bpeVocabSql())
}
