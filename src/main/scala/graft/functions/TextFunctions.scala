package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, token hashing, language ID, quality
  * scoring, fingerprinting. All pure Column expressions (whole-stage
  * codegen'd, no UDFs) so they run at scan speed and push down through
  * Catalyst; each has an exact DuckDB-SQL equivalent used by the
  * correctness oracle (see graft.queries.TextOps/DedupOps).
  */
object TextFunctions {

  /** Whitespace tokens (documents are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Stable 32-bit token hash shared with the DuckDB oracle:
    * first 8 hex chars of md5, read as an integer (0..2^32-1). */
  def tokenHash(tok: Column): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long")

  /** 60-bit document fingerprint (15 md5 hex chars — stays positive in
    * a signed 64-bit int in every engine). */
  def fingerprint64(text: Column): Column =
    conv(substring(md5(text), 1, 15), 16, 10).cast("long")

  // -- THE corpus split rule (90/5/5 by md5 bucket of doc_id) ---------
  //
  // Single source of truth: the invariant "same doc → same split in
  // every query, every engine, every run" only holds if nothing
  // re-derives the rule by hand. Spark callers use splitBucket /
  // splitAssign; oracle SQL interpolates splitBucketSql / splitCaseSql.

  def splitBucket(id: Column): Column = tokenHash(id.cast("string")) % 100

  /** Bucket→split assignment over an already-projected bucket column
    * (for plans that carry the bucket through intermediate stages). */
  def splitFromBucket(b: Column): Column =
    when(b < 90, "train").when(b < 95, "val").otherwise("test")

  def splitAssign(id: Column): Column = splitFromBucket(splitBucket(id))

  /** DuckDB twin of [[fingerprint64]] over an arbitrary expression. */
  def fp64Sql(expr: String): String =
    s"CAST(concat('0x', substr(md5($expr), 1, 15)) AS BIGINT)"

  /** DuckDB twin of [[splitBucket]] over a bigint id expression. */
  def splitBucketSql(id: String): String =
    s"CAST(concat('0x', substr(md5(CAST($id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"

  /** DuckDB twin of the bucket→split assignment, over an already-
    * projected bucket column/expression. */
  def splitCaseSql(bucket: String): String =
    s"CASE WHEN $bucket < 90 THEN 'train' " +
      s"WHEN $bucket < 95 THEN 'val' ELSE 'test' END"

  /** Token 3-gram shingles over an already-materialized token-array
    * column (1-based element_at to mirror DuckDB's 1-based list
    * indexing); short texts fall back to the whole text joined back as
    * a single shingle.
    *
    * PERF: `toks` MUST be a materialized attribute (a column produced
    * by a previous projection), never the raw `split(text, ' ')`
    * expression — Catalyst inlines expression arguments into every
    * `element_at` call inside the lambda, turning shingling into
    * O(tokens² · textlen) re-splitting. Use [[withTokens]] first. */
  def shingles3FromTokens(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2))))
      .otherwise(array(concat_ws(" ", toks)))

  /** Token bigrams (same contract as [[shingles3FromTokens]]: pass a
    * MATERIALIZED token array; docs under 2 tokens collapse to one
    * whole-text gram). Feeds the duplicate-bigram repetition signal. */
  def shingles2FromTokens(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array(concat_ws(" ", toks)))

  /** Project a materialized token array (see shingles3FromTokens). */
  def withTokens(df: org.apache.spark.sql.DataFrame, text: Column,
                 as: String = "toks"): org.apache.spark.sql.DataFrame =
    df.withColumn(as, tokens(text))

  // -- winnowing document fingerprints (rolling hash + window min) ----

  /** char k-gram size / winnow window (Schleimer et al. parameters). */
  val winnowK = 8
  val winnowW = 4
  /** polynomial rolling-hash base/modulus; 64-bit-safe integer math
    * reproduced exactly by the DuckDB oracle. */
  val winnowP = 1000000007L
  val winnowB = 257L
  /** B^(k-1-j) mod P for j = 0..k-1. */
  def polyPowers(k: Int): Seq[Long] = (0 until k).map { j =>
    var acc = 1L
    (0 until (k - 1 - j)).foreach(_ => acc = acc * winnowB % winnowP)
    acc
  }
  val winnowPowers: Seq[Long] = polyPowers(winnowK)

  /** Polynomial rolling hashes of all char k-grams of `text`, as an
    * array column (integer math only — no per-window digest calls —
    * reproduced exactly by the DuckDB oracles, which are generated
    * from the same [[polyPowers]] constants). Shared by winnowing
    * (k = [[winnowK]]) and the CDC chunker's boundary rule
    * (MultimodalPipeline.cdcChunkHashes).
    *
    * Computed by the native codegen'd [[RollingHashExpr]] — O(n)
    * incremental (one char read per position) instead of the
    * interpreted k-term-per-position HOF it replaces (measured 32 s →
    * sub-second for the CDC boundary scan at sf0.1; HOF lambdas are
    * never whole-stage-codegen'd).
    *
    * PERF: still project this into its own column and pass that
    * ATTRIBUTE to the consuming stage — composing the stages as one
    * expression inlines this whole array into every element of the
    * consumer, turning O(n) → O(n²). Same pitfall as
    * [[shingles3FromTokens]]. */
  def polyWindowHashes(text: Column, k: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(RollingHashExpr(
      org.apache.spark.sql.graft.Bridge.expression(text), k))

  /** Stage 1 of winnowing: [[polyWindowHashes]] at k = [[winnowK]]. */
  def winnowHashes(text: Column): Column = polyWindowHashes(text, winnowK)

  /** Stage 2 of winnowing over a MATERIALIZED hash-array attribute:
    * min of each sliding w-window, deduped + sorted — the classic
    * robust document fingerprint (any shared substring of length ≥
    * k+w−1 guarantees a shared fingerprint). */
  def winnowFromHashes(hashes: Column): Column = {
    val nWins = greatest(lit(1), size(hashes) - lit(winnowW - 1))
    val wins = transform(sequence(lit(1), nWins), i =>
      array_min(slice(hashes, i, lit(winnowW))))
    sort_array(array_distinct(wins))
  }

  /** Per-language stopword lists for the n-gram-free language-ID
    * heuristic. Deterministic and tiny by design: language ID at 100 TB
    * must be a scan-local expression, not a model call. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "es" -> Seq("el", "los", "las", "y", "es", "una"),
    "zh" -> Seq("的", "是", "不", "我", "了"))

  /** Count of tokens that appear in `words`. */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(w => w: Any): _*)))
      .cast("long")

  /** Highest-scoring language, ties broken by list order (en first),
    * 'und' (undetermined) when no stopword hits at all. */
  def langId(text: Column): Column = {
    val hits = stopwords.map { case (lang, ws) => lang -> stopwordHits(text, ws) }
    val maxHits = greatest(hits.map(_._2): _*)
    hits.foldRight(lit("und")) { case ((lang, h), acc) =>
      when(h === maxHits && maxHits > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Heuristic quality score in [0,1]: half lexical diversity
    * (distinct/total tokens), half length saturation (chars/200 capped).
    * Rounded to 6 so oracle float comparison is exact. */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val distinctRatio =
      size(array_distinct(t)).cast("double") / size(t).cast("double")
    val lenScore = least(lit(1.0), length(text).cast("double") / lit(200.0))
    round(lit(0.5) * distinctRatio + lit(0.5) * lenScore, 6)
  }
}
