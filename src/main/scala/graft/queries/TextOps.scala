package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Text-analysis operators over the `documents` table (SURVEY.md §7.4
  * milestone 5 / BASELINE.json north star): token stats, fingerprints,
  * language ID, quality scoring. All scan-local Column expressions —
  * at 100 TB these run inside the parquet scan with no shuffle at all.
  */
object TextOps {

  // DuckDB fragments mirroring TextFunctions (same md5-derived hashes).
  private val tokSql = "string_split(text, ' ')"

  /** PII detection patterns (t_pii_redact), written in the
    * conservative character-class regex subset that behaves
    * identically under Java regex (Spark) and RE2 (DuckDB): no
    * backreferences, no lookaround, no engine-specific classes. */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\+1-555-[0-9]{4}"
  private def fp64Sql(expr: String) = TextFunctions.fp64Sql(expr)

  // BPE training (t_bpe_train): shared pre-tokenizer pattern (the same
  // one t_token_bpe counts with) and merge-round count. Symbols are
  // wrapped as "<sym>" — '<'/'>' are outside the corpus charset
  // (lowercase + space) and outside both engines' non-regex `replace`
  // metacharacters, so "<l><r>" matches exactly a full-left-symbol /
  // full-right-symbol adjacency and nothing else.
  private val bpePat = " ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+| +"
  private val bpeMerges = 8

  /** Shared BPE merge loop over the documents corpus: the corpus is
    * scanned once into a (word, sym, cnt) vocab table; each round is a
    * vocab-sized pair-count shuffle + TakeOrdered(1) + 1-row broadcast
    * merge-apply. localCheckpoint truncates the plan between rounds
    * (the VectorTools.lloyd pattern). Returns the rank-ordered merge
    * table AND the post-merge vocab (word → merged symbol string) —
    * the two halves a tokenizer deployment needs (t_bpe_train emits
    * the former, t_bpe_encode joins the corpus against the latter). */
  private def bpeMergeLoop(spark: org.apache.spark.sql.SparkSession,
                           dir: String, n: Int)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    bpeMergeLoopFrom(spark,
      bpePreTokens(Registry.table(spark, dir, "documents"))
        .groupBy("w").agg(count(lit(1)).as("cnt")), n)

  /** The corpus pre-tokenized with the shared BPE pattern — one `w`
    * row per occurrence. Scan-local; shared by the batch merge loop
    * and the streamed word-count ingest (s64). */
  private[queries] def bpePreTokens(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.select(explode(
      expr(s"regexp_extract_all(text, '$bpePat', 0)")).as("w"))

  /** [[bpeMergeLoop]] over a SUPPLIED word-frequency table (w, cnt) —
    * the merge rounds never touch the corpus again, so a streamed
    * word-count state (s64) trains the identical tokenizer. */
  private[queries] def bpeMergeLoopFrom(
      spark: org.apache.spark.sql.SparkSession,
      wordCounts: org.apache.spark.sql.DataFrame, n: Int)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    var w = wordCounts
      .select(col("w"),
        regexp_replace(col("w"), "(.)", "<$1>").as("sym"), col("cnt"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.DataFrame]()
    for (rank <- 1 to n) {
      val best = w
        .select(split(expr("trim(BOTH '<>' FROM sym)"), "><").as("syms"), col("cnt"))
        .select(explode(expr(
          "transform(slice(syms, 1, size(syms) - 1), (x, i) -> struct(x AS l, syms[i + 1] AS r))"))
          .as("p"), col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("l"), col("r"))
        .limit(1)
        .localCheckpoint()
      merges += best.select(lit(rank).as("merge_rank"), col("l"), col("r"),
        concat(col("l"), col("r")).as("merged"), col("pair_count"))
      w = w.crossJoin(broadcast(best.select(col("l"), col("r"))))
        .select(col("w"), expr(
          "replace(sym, '<' || l || '><' || r || '>', '<' || l || r || '>')").as("sym"),
          col("cnt"))
        .localCheckpoint()
    }
    (merges.reduce(_.unionAll(_)).orderBy(col("merge_rank")), w)
  }

  /** The unrolled merge-round CTE chain (w0 → b1/w1 → … → bN/wN),
    * shared by the t_bpe_train and t_bpe_encode oracles. */
  private def bpeCteSql(n: Int): String = {
    val sb = new StringBuilder(
      s"""w0 AS (
         |  SELECT w, regexp_replace(w, '(.)', '<\\1>', 'g') AS sym, count(*) AS cnt
         |  FROM (SELECT unnest(regexp_extract_all(text, '$bpePat', 0)) AS w FROM documents)
         |  GROUP BY 1, 2)""".stripMargin)
    for (r <- 1 to n) sb.append(s""",
      |p$r AS (SELECT syms[i] AS l, syms[i+1] AS r, cnt FROM
      |  (SELECT string_split(trim(sym, '<>'), '><') AS syms, cnt FROM w${r - 1}) t,
      |  unnest(generate_series(1, len(syms)-1)) g(i)),
      |b$r AS (SELECT l, r, CAST(sum(cnt) AS BIGINT) AS pair_count FROM p$r
      |  GROUP BY l, r ORDER BY pair_count DESC, l, r LIMIT 1),
      |w$r AS (SELECT w, replace(sym, '<'||b.l||'><'||b.r||'>', '<'||b.l||b.r||'>') AS sym, cnt
      |  FROM w${r - 1}, b$r b)""".stripMargin)
    sb.toString
  }

  /** t_bpe_train's serving half over a supplied (w, cnt) table —
    * shared with the streamed twin s64. */
  private[queries] def bpeTrainFromCounts(
      spark: org.apache.spark.sql.SparkSession,
      wordCounts: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    bpeMergeLoopFrom(spark, wordCounts, bpeMerges)._1

  /** t_bpe_train's oracle at the shared merge count — for s64. */
  private[queries] lazy val bpeTrainSharedOracleSql: String =
    bpeTrainOracleSql(bpeMerges)

  /** DuckDB oracle unrolling the identical `n` merge rounds as CTEs. */
  private def bpeTrainOracleSql(n: Int): String =
    "WITH " + bpeCteSql(n) +
      "\nSELECT * FROM (" + (1 to n).map(r =>
        s"SELECT $r AS merge_rank, l, r, l||r AS merged, pair_count FROM b$r")
        .mkString(" UNION ALL ") + ") ORDER BY merge_rank"

  /** DuckDB oracle for t_bpe_encode: the same unrolled training chain,
    * then every document's pre-tokens joined against the final vocab's
    * post-merge symbol counts. */
  private def bpeEncodeOracleSql(n: Int): String =
    s"""WITH ${bpeCteSql(n)},
       |vc AS (SELECT w, len(string_split(trim(sym, '<>'), '><')) AS n_sym
       |  FROM w$n),
       |dw AS (SELECT doc_id, unnest(regexp_extract_all(text, '$bpePat', 0)) AS w
       |  FROM documents)
       |SELECT dw.doc_id, count(*) AS n_words,
       |  CAST(sum(vc.n_sym) AS BIGINT) AS n_bpe_tokens
       |FROM dw JOIN vc USING (w)
       |GROUP BY dw.doc_id ORDER BY doc_id""".stripMargin

  def entries: Seq[Entry] = Seq(

    Entry("t_token_stats",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents")
        d.select(col("doc_id"), col("n_chars"),
            TextFunctions.tokenCount(col("text")).as("n_tokens"),
            size(array_distinct(TextFunctions.tokens(col("text"))))
              .cast("long").as("n_distinct_tokens"),
            TextFunctions.fingerprint64(col("text")).as("fp64"),
            md5(col("text")).as("fp_md5"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, n_chars,
        |  len($tokSql) AS n_tokens,
        |  len(list_distinct($tokSql)) AS n_distinct_tokens,
        |  ${fp64Sql("text")} AS fp64,
        |  md5(text) AS fp_md5
        |FROM documents ORDER BY doc_id""".stripMargin)),

    Entry("t_lang_id",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents")
        d.select(col("doc_id"), col("lang"),
            TextFunctions.langId(col("text")).as("lang_pred"))
          .orderBy(col("doc_id"))
      },
      Some {
        val hits = TextFunctions.stopwords.map { case (lang, ws) =>
          val inList = ws.map(w => s"'$w'").mkString(", ")
          lang -> s"len(list_filter($tokSql, t -> t IN ($inList)))"
        }
        val defs = hits.map { case (l, e) => s"$e AS s_$l" }.mkString(",\n  ")
        val gmax = hits.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
        val cases = hits.map { case (l, _) =>
          s"WHEN gmax > 0 AND s_$l = gmax THEN '$l'"
        }.mkString(" ")
        s"""WITH h AS (SELECT doc_id, lang, $defs FROM documents),
           |g AS (SELECT *, $gmax AS gmax FROM h)
           |SELECT doc_id, lang,
           |  CASE $cases ELSE 'und' END AS lang_pred
           |FROM g ORDER BY doc_id""".stripMargin
      }),

    // BPE-ish regex tokenization (GPT2-style pattern simplified to the
    // corpus's charset): letter runs, digit runs, punctuation runs,
    // whitespace — the pre-tokenizer shape of byte-pair encoders,
    // counted per document. Same RE2-compatible pattern both engines.
    Entry("t_token_bpe",
      (spark, dir) => {
        val pat = " ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+| +"
        val d = Registry.table(spark, dir, "documents")
        d.select(col("doc_id"),
            size(expr(s"regexp_extract_all(text, '$pat', 0)"))
              .cast("long").as("n_bpe_tokens"),
            TextFunctions.tokenCount(col("text")).as("n_ws_tokens"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
        |  len(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+| +', 0)) AS n_bpe_tokens,
        |  len(string_split(text, ' ')) AS n_ws_tokens
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // REAL BPE vocabulary training: the distributed merge loop, not
    // just the pre-tokenizer count above. Words (pre-tokens from the
    // same GPT2-ish regex as t_token_bpe) are frequency-aggregated
    // once, each word encoded as boundary-wrapped symbols
    // ("<t><h><e>"); then `bpeMerges` rounds of: count adjacent symbol
    // pairs weighted by word frequency → pick the global max (count
    // DESC, then (l, r) lexicographic — both engines' binary string
    // order) → apply the merge to every word as a single non-regex
    // replace("<l><r>" -> "<lr>"), whose left-to-right non-overlapping
    // scan IS greedy BPE merging ("<a><a><a><a>" -> "<aa><aa>"), and
    // the per-symbol <> wrapping makes prefix false-matches impossible
    // ("<a><bc>" never matches "<a><b>"). Output: the learned merge
    // table, rank by rank — merge r can consume merge r-1's symbol
    // (at sf0.001 rank 8 is 'p'+'ar' over rank 7's 'ar').
    //
    // 100 TB: the corpus is touched ONCE (pre-token groupBy); every
    // round after that runs over the word-frequency table (vocab-sized,
    // orders of magnitude smaller), with one pair-count shuffle and a
    // TakeOrdered(1) per round; the chosen pair rejoins as a 1-row
    // broadcast, and localCheckpoint truncates the growing plan between
    // rounds (same pattern as core.VectorTools.lloyd). The oracle
    // unrolls the identical rounds as CTEs (the v_kmeans_lloyd3
    // pattern), so the whole training trajectory is hash-checked.
    Entry("t_bpe_train",
      (spark, dir) => bpeMergeLoop(spark, dir, bpeMerges)._1,
      Some(bpeTrainOracleSql(bpeMerges))),

    // TRAIN → APPLY, closed: tokenize the corpus with the vocabulary
    // t_bpe_train just learned. The post-merge vocab (word → merged
    // symbol string) is the DEPLOYED tokenizer artifact; each document
    // re-pre-tokenizes scan-locally and joins its words against the
    // vocab's per-word token counts — at 100 TB the vocab is the small
    // side (broadcastable), the corpus never re-enters the merge loop,
    // and per-doc BPE token counts (the budget input of packing /
    // context-window accounting) come out of one join + one groupBy.
    // n_words rides along, so compression (n_bpe_tokens < 3·n_words
    // style checks) is measurable per document. The oracle extends the
    // same unrolled CTE chain through the vocab join.
    Entry("t_bpe_encode",
      (spark, dir) => {
        val vocab = bpeMergeLoop(spark, dir, bpeMerges)._2
          .select(col("w"),
            size(split(expr("trim(BOTH '<>' FROM sym)"), "><"))
              .cast("long").as("n_sym"))
        Registry.table(spark, dir, "documents")
          .select(col("doc_id"),
            explode(expr(s"regexp_extract_all(text, '$bpePat', 0)")).as("w"))
          .join(broadcast(vocab), "w")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"),
            sum(col("n_sym")).as("n_bpe_tokens"))
          .orderBy(col("doc_id"))
      },
      Some(bpeEncodeOracleSql(bpeMerges))),

    // Winnowing fingerprints (rolling-hash k-grams + window-min
    // selection): the canonical robust document fingerprint; shared
    // substrings of length >= k+w-1 guarantee shared fingerprints.
    Entry("t_winnow_fingerprint",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents")
          .select(col("doc_id"), col("text"))
          .repartition(spark.sparkContext.defaultParallelism)
        // fps serialized to a comma-joined string: the driver's
        // comparator cannot sort/hash array cells. The fingerprint set
        // is sorted first, so the string form is deterministic.
        d.select(col("doc_id"),
            TextFunctions.winnowHashes(col("text")).as("hs"))
          .select(col("doc_id"),
            TextFunctions.winnowFromHashes(col("hs")).as("fps"))
          .withColumn("n_fps", size(col("fps")).cast("long"))
          .select(col("doc_id"),
            concat_ws(",", col("fps").cast("array<string>")).as("fps"),
            col("n_fps"))
          .orderBy(col("doc_id"))
      },
      Some {
        import TextFunctions.{winnowK => k, winnowW => w, winnowP => p}
        val gram = TextFunctions.winnowPowers.zipWithIndex.map {
          case (pw, j) => s"ascii(substr(text, i + $j, 1))::BIGINT * $pw"
        }.mkString(" + ")
        s"""WITH h AS (SELECT doc_id,
           |  list_transform(generate_series(1, greatest(1, length(text) - ${k - 1})),
           |    i -> ($gram) % $p) AS hs
           |  FROM documents),
           |w AS (SELECT doc_id,
           |  list_transform(generate_series(1, greatest(1, len(hs) - ${w - 1})),
           |    i -> list_min(hs[i:i+${w - 1}])) AS wins
           |  FROM h)
           |SELECT doc_id,
           |  array_to_string(list_sort(list_distinct(wins)), ',') AS fps,
           |  len(list_distinct(wins)) AS n_fps
           |FROM w ORDER BY doc_id""".stripMargin
      }),

    Entry("t_quality",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents")
        d.select(col("doc_id"),
            TextFunctions.qualityScore(col("text")).as("quality"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
        |  round(0.5 * (len(list_distinct($tokSql))::DOUBLE / len($tokSql)::DOUBLE)
        |      + 0.5 * least(1.0, length(text)::DOUBLE / 200.0), 6) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // PII REDACTION — the compliance scrub every training-data
    // pipeline runs before a corpus ships: find emails and phone
    // numbers, replace them with typed placeholder tags, and count
    // what was scrubbed per document. The synthetic corpus carries no
    // PII, so the fixture INJECTS a deterministic contact line per
    // document (one email always; a second cc address on every third
    // doc, so GLOBAL — not first-match — replacement is proven, the
    // classic regexp_replace footgun: DuckDB needs the explicit 'g'
    // flag Spark implies). The detection/replacement regexes are the
    // real machinery, written in the conservative character-class
    // subset that parses identically under Java regex and DuckDB's
    // RE2. Scan-local: a per-row codegen'd transform fused into the
    // parquet read — at 100 TB redaction costs one linear scan, no
    // shuffle.
    Entry("t_pii_redact",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents")
        val withPii = d.select(col("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id"), lit("@example.com"),
            when(pmod(col("doc_id"), lit(3)) === 0,
              concat(lit(" cc admin"), col("doc_id"),
                lit("@corp.example.org"))).otherwise(lit("")),
            lit(" tel +1-555-"),
            lpad(pmod(col("doc_id") * 7919, lit(10000)).cast("string"), 4, "0"))
            .as("text"))
        withPii.select(col("doc_id"),
            regexp_count(col("text"), lit(emailRe)).cast("long")
              .as("n_emails"),
            regexp_count(col("text"), lit(phoneRe)).cast("long")
              .as("n_phones"),
            length(regexp_replace(
              regexp_replace(col("text"), emailRe, "<EMAIL>"),
              phoneRe, "<PHONE>")).cast("long").as("clean_len"),
            md5(regexp_replace(
              regexp_replace(col("text"), emailRe, "<EMAIL>"),
              phoneRe, "<PHONE>")).as("clean_md5"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH p AS (SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com' ||
        |    CASE WHEN doc_id % 3 = 0
        |      THEN ' cc admin' || doc_id || '@corp.example.org'
        |      ELSE '' END ||
        |    ' tel +1-555-' ||
        |    lpad(CAST(doc_id * 7919 % 10000 AS VARCHAR), 4, '0') AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '$emailRe')) AS BIGINT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(text, '$phoneRe')) AS BIGINT)
        |    AS n_phones,
        |  CAST(length(regexp_replace(regexp_replace(text,
        |    '$emailRe', '<EMAIL>', 'g'), '$phoneRe', '<PHONE>', 'g'))
        |    AS BIGINT) AS clean_len,
        |  md5(regexp_replace(regexp_replace(text,
        |    '$emailRe', '<EMAIL>', 'g'), '$phoneRe', '<PHONE>', 'g'))
        |    AS clean_md5
        |FROM p ORDER BY doc_id""".stripMargin)),

    // Deterministic stratified train/val/test split (90/5/5) by md5
    // hash bucket of doc_id — the reproducible, shuffle-free,
    // join-stable way to split a corpus (the same doc lands in the same
    // split on every engine, every run, at every scale; adding data
    // never moves existing docs between splits). Scan-local: the bucket
    // is a per-row expression, the only shuffle is the stats groupBy.
    // Output is the per-(lang, split) composition a curation pipeline
    // monitors; the oracle mirrors the identical integer hash.
    Entry("t_sample_split",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents")
        d.withColumn("split", TextFunctions.splitAssign(col("doc_id")))
          .groupBy(col("lang"), col("split"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
            min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
          .orderBy(col("lang"), col("split"))
      },
      Some(s"""WITH b AS (SELECT lang, doc_id, n_chars,
        |  ${TextFunctions.splitBucketSql("doc_id")} AS bucket
        |  FROM documents)
        |SELECT lang,
        |  ${TextFunctions.splitCaseSql("bucket")} AS split,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM b GROUP BY 1, 2 ORDER BY lang, split""".stripMargin)),

    // DOMAIN MIXING — downsample a skewed corpus to a target domain
    // mixture (en 40 / de 15 / es 15 / fr 15 / zh 15 here), the
    // data-mixture step every LLM pretraining pipeline runs. The
    // capacity T is the largest output size every domain can fill at
    // its target share (min over domains of count/share); each
    // domain's quota is then taken by a DETERMINISTIC hash threshold:
    // keep a doc iff md5(doc_id) mod 1e6 < quota·1e6/count. Selection
    // is thus a scan-local filter against a ≤5-row broadcast — no
    // per-domain sort/row_number (the exact-k shape that serializes
    // each domain through one reducer at 100 TB) — at the cost of a
    // Chernoff-bounded miss on the quota (|achieved−target| =
    // O(1/√n) per domain), the trade production samplers make. All
    // integer arithmetic; sum(doc_id) of the selected set makes the
    // hash check sensitive to the exact membership, not just counts.
    Entry("t_domain_mix",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents")
          .select(col("doc_id"), col("lang"))
        domainMixFrom(spark, dir,
          d.groupBy(col("lang")).agg(count(lit(1)).as("c")))
      },
      Some(domainMixOracleSql)),

    // Corpus vocabulary statistics: top-50 tokens by occurrence count
    // with document frequency — the heavy-hitter query every curation
    // pipeline runs (vocabulary pruning, stopword discovery, boilerplate
    // detection via df/n_docs). Token frequency is the canonical
    // Zipf-skew aggregation: map-side partial aggregation collapses the
    // hot tokens per partition BEFORE the shuffle, so the skewed keys
    // never concentrate raw rows on one reducer. The exact
    // count(DISTINCT doc_id) costs a second shuffle on (tok, doc_id);
    // at 100 TB swap it for approx_count_distinct (one pass, mergeable
    // HLL partials) — same plan shape otherwise.
    Entry("t_top_tokens",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents")
        d.select(col("doc_id"),
            explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
          .filter(length(col("tok")) > 0)
          .groupBy(col("tok"))
          .agg(count(lit(1)).as("n_occurrences"),
            countDistinct(col("doc_id")).as("n_docs"))
          .orderBy(col("n_occurrences").desc, col("tok"))
          .limit(50)
      },
      Some("""WITH t AS (SELECT doc_id,
        |  unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok
        |  FROM documents)
        |SELECT tok, count(*) AS n_occurrences,
        |  count(DISTINCT doc_id) AS n_docs
        |FROM t WHERE length(tok) > 0
        |GROUP BY tok ORDER BY n_occurrences DESC, tok LIMIT 50""".stripMargin)),

    // TRAIN/TEST DECONTAMINATION — the n-gram overlap check every
    // pre-training pipeline runs before evaluation (report test docs
    // whose shingles leak from the training split). Reuses the exact
    // t_sample_split bucketing (same doc -> same split everywhere) and
    // the near-dup family's 3-token shingling. Scale shape: shingles
    // are reduced to 60-bit fingerprints BEFORE the join, so the
    // train-side build is a distinct-agg on longs and the probe is a
    // long=long equi-join — one slim shuffle per side, no strings on
    // the wire, no cross product. (Collisions at 60 bits are
    // negligible and mirrored bit-for-bit by the oracle.)
    Entry("t_contamination",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents")
          .select(col("doc_id"), col("text"))
          .repartition(spark.sparkContext.defaultParallelism)
        val sh = d
          .withColumn("split", TextFunctions.splitAssign(col("doc_id")))
          .select(col("doc_id"), col("split"),
            TextFunctions.tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("split"),
            explode(array_distinct(
              TextFunctions.shingles3FromTokens(col("toks")))).as("sh"))
          .select(col("doc_id"), col("split"),
            TextFunctions.fingerprint64(col("sh")).as("fp"))
        val train = sh.filter(col("split") === "train")
          .select(col("fp")).distinct().withColumn("hit", lit(1))
        sh.filter(col("split") === "test")
          .join(train, Seq("fp"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"),
            count(col("hit")).as("n_contaminated"))
          .withColumn("contamination",
            round(col("n_contaminated") / col("n_shingles"), 6))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH b AS (SELECT doc_id, text,
        |  ${TextFunctions.splitCaseSql(TextFunctions.splitBucketSql("doc_id"))} AS split
        |  FROM documents),
        |sh AS (SELECT doc_id, split,
        |  ${fp64Sql("sh")} AS fp
        |  FROM (SELECT doc_id, split,
        |    unnest(list_distinct(${DedupOps.shinglesListSql})) AS sh FROM b)),
        |tr AS (SELECT DISTINCT fp FROM sh WHERE split = 'train')
        |SELECT sh.doc_id, count(*) AS n_shingles,
        |  count(tr.fp) AS n_contaminated,
        |  round(count(tr.fp) / count(*), 6) AS contamination
        |FROM sh LEFT JOIN tr ON sh.fp = tr.fp
        |WHERE sh.split = 'test'
        |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin)),

    // REPETITION / BOILERPLATE SIGNALS — the Gopher-style repetition
    // cuts every curation pipeline applies: the duplicate-bigram
    // fraction (1 - distinct/total token bigrams, scan-local over the
    // materialized token array) and the top-token frequency ratio
    // (mode count / n_tokens — one slim (doc, tok) count shuffle).
    // Both are exact integer ratios, so the doubles are bit-identical
    // across engines. At 100 TB the bigram half never leaves the
    // scan; the mode half aggregates (doc_id, tok) with map-side
    // partials bounded by per-doc vocabulary.
    Entry("t_repetition",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents")
          .select(col("doc_id"), col("text"))
        val big = d
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
          .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
            TextFunctions.shingles2FromTokens(col("toks")).as("sh2"))
          .select(col("doc_id"), col("n_tokens"),
            round(lit(1.0) - size(array_distinct(col("sh2")))
              / size(col("sh2")), 6).as("dup_bigram_frac"))
        val mode = d
          .select(col("doc_id"), explode(TextFunctions.tokens(col("text")))
            .as("tok"))
          .groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(max(col("c")).as("top_tok_count"))
        big.join(mode, Seq("doc_id"))
          .withColumn("top_tok_ratio",
            round(col("top_tok_count") / col("n_tokens"), 6))
          .select(col("doc_id"), col("n_tokens"), col("dup_bigram_frac"),
            col("top_tok_count"), col("top_tok_ratio"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
        |b AS (SELECT doc_id, len(toks) AS n_tokens,
        |  CASE WHEN len(toks) >= 2
        |    THEN list_transform(generate_series(1, len(toks) - 1),
        |      i -> concat_ws(' ', toks[i], toks[i+1]))
        |    ELSE [array_to_string(toks, ' ')] END AS sh2
        |  FROM t),
        |big AS (SELECT doc_id, n_tokens,
        |  round(1.0 - len(list_distinct(sh2)) / len(sh2), 6) AS dup_bigram_frac
        |  FROM b),
        |m AS (SELECT doc_id, max(c) AS top_tok_count FROM (
        |  SELECT doc_id, tok, count(*) AS c FROM
        |    (SELECT doc_id, unnest(toks) AS tok FROM t)
        |  GROUP BY doc_id, tok) GROUP BY doc_id)
        |SELECT big.doc_id, n_tokens, dup_bigram_frac, top_tok_count,
        |  round(top_tok_count / n_tokens, 6) AS top_tok_ratio
        |FROM big JOIN m ON big.doc_id = m.doc_id
        |ORDER BY big.doc_id""".stripMargin)),

    // PER-DOCUMENT SALIENT TERMS — tf-idf-style term extraction (the
    // keyword/topic signal curation pipelines use for domain mixing
    // and boilerplate discovery). The idf factor is kept in BM25's
    // rational form (N - df + 0.5)/(df + 0.5) rather than its log:
    // every op is then a correctly-rounded IEEE +,-,*,/ identical
    // across engines, where ln() implementations differ by ULPs.
    // Scale shape: tf aggregates on (doc, term), df on term, the
    // tf<->df equi-join shuffles slim (term, count) rows, the corpus
    // size joins in as a broadcast single row, and top-5 per doc is a
    // doc-partitioned window — never a global sort.
    Entry("t_tfidf_top",
      (spark, dir) => {
        val model = tfidfDocTokens(
            Registry.table(spark, dir, "documents"))
          .groupBy(col("tok")).agg(count(lit(1)).as("df"))
        tfidfTopFrom(spark, dir, model)
      },
      Some(tfidfTopOracleSql)),

    // MODEL-BASED QUALITY SCORE — the third leg of the quality-filter
    // family (heuristics: t_quality; repetition: t_repetition; model:
    // here). Production pipelines score documents with a language
    // model (CCNet's KenLM perplexity); the deterministic stand-in
    // with identical plumbing is the corpus-trained UNIGRAM model:
    // each token occurrence scores its corpus probability, a document
    // scores the mean. Everything stays rational until one final
    // division — avg_prob = Σ_t tf_t·cnt_t / (n_tokens·total) — so
    // the score is IEEE-identical across engines with no ln() ULP
    // hazard (the t_tfidf_top discipline). Scale shape: token-keyed
    // partial-agg shuffles for the model and the per-doc tf, a slim
    // (tok, cnt) equi-join, the corpus total broadcast as one row —
    // at 100 TB the Zipf head collapses in map-side partials and the
    // model fits the same join a tf-idf pass already runs.
    Entry("t_unigram_lm",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents")
        val toks = d.select(col("doc_id"),
            explode(TextFunctions.tokens(col("text"))).as("tok"))
        val vocab = toks.groupBy(col("tok"))
          .agg(count(lit(1)).as("cnt"))
        val total = toks.agg(count(lit(1)).as("total"))
        val tf = toks.groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("tf"))
        tf.join(vocab, Seq("tok"))
          .groupBy(col("doc_id"))
          .agg(sum(col("tf") * col("cnt")).as("wsum"),
            sum(col("tf")).as("n_tokens"))
          .crossJoin(broadcast(total))
          .select(col("doc_id"), col("n_tokens"),
            round(col("wsum") / (col("n_tokens") * col("total")), 6)
              .as("avg_prob"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (SELECT doc_id, unnest($tokSql) AS tok
        |  FROM documents),
        |vocab AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
        |tot AS (SELECT count(*) AS total FROM t),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t
        |  GROUP BY doc_id, tok),
        |ds AS (SELECT tf.doc_id,
        |    CAST(sum(tf.tf * vocab.cnt) AS BIGINT) AS wsum,
        |    CAST(sum(tf.tf) AS BIGINT) AS n_tokens
        |  FROM tf JOIN vocab USING (tok) GROUP BY tf.doc_id)
        |SELECT ds.doc_id, ds.n_tokens,
        |  round(ds.wsum / (ds.n_tokens * tot.total), 6) AS avg_prob
        |FROM ds CROSS JOIN tot ORDER BY ds.doc_id""".stripMargin)),

    // BIGRAM CONDITIONAL-PROBABILITY LM SCORE — the quality rung above
    // t_unigram_lm (the CCNet-style LM filter, now with CONTEXT): per
    // document the mean of p(w_i | w_{i-1}) = c(w_{i-1} w_i) /
    // c(w_{i-1} ·), both counts corpus-trained. Unlike the unigram row
    // there is no common denominator keeping the mean rational, so
    // each conditional probability is fixed-point-quantized
    // scan-locally — micro = floor(p·10⁶ + 0.5), the established
    // half-up idiom — and the per-doc aggregation sums exact INTEGERS
    // (order-independent, no float-accumulation hazard in either
    // engine); the mean divides once at the end. Shuffle structure is
    // the unigram row's plus one join: a slim (doc, w1, w2) explode,
    // token-keyed count aggs, joins back on the bigram/context key.
    Entry("t_bigram_lm",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents")
        val bi = d.select(col("doc_id"),
            TextFunctions.tokens(col("text")).as("t"))
          .filter(size(col("t")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(slice(t, 1, size(t) - 1), " +
              "(x, i) -> struct(x AS w1, t[i + 1] AS w2))")).as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        val bc = bi.groupBy(col("w1"), col("w2"))
          .agg(count(lit(1)).as("bcnt"))
        val cc = bi.groupBy(col("w1"))
          .agg(count(lit(1)).as("ccnt"))
        bi.join(bc, Seq("w1", "w2")).join(cc, Seq("w1"))
          .withColumn("micro",
            floor(col("bcnt") / col("ccnt") * lit(1000000d) + lit(0.5)))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            sum(col("micro")).as("micro_sum"))
          // the mean stays in exact micro-units (half-up floor, never
          // round(): a mean landing exactly on a 6th-decimal tie
          // rounds HALF_UP in Spark but half-to-even in DuckDB — one
          // corpus row hit that tie); the /1e6 rescale of an
          // identical integer is the identical double in both engines
          .select(col("doc_id"), col("n_bigrams"), col("micro_sum"),
            (floor(col("micro_sum") / col("n_bigrams") + lit(0.5)) /
              lit(1000000d)).as("avg_cond_prob"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
        |b AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        |  FROM t, unnest(generate_series(1, len(toks) - 1)) g(i)),
        |bc AS (SELECT w1, w2, count(*) AS bcnt FROM b GROUP BY 1, 2),
        |cc AS (SELECT w1, count(*) AS ccnt FROM b GROUP BY 1),
        |ds AS (SELECT b.doc_id, count(*) AS n_bigrams,
        |    CAST(sum(floor(bc.bcnt / cc.ccnt * 1000000 + 0.5)) AS BIGINT)
        |      AS micro_sum
        |  FROM b JOIN bc USING (w1, w2) JOIN cc USING (w1)
        |  GROUP BY b.doc_id)
        |SELECT doc_id, n_bigrams, micro_sum,
        |  floor(micro_sum / n_bigrams + 0.5) / 1000000 AS avg_cond_prob
        |FROM ds ORDER BY doc_id""".stripMargin)),

    // PER-LANGUAGE VOCABULARY CARDINALITY via the KMV mergeable sketch
    // ([[graft.functions.KmvSketchAgg]]) — the corpus-monitoring
    // counterpart to q_approx_distinct, with the property HLL++ cannot
    // give: the estimate is a deterministic pure function of the hash
    // set, so the DuckDB oracle reproduces it BIT-FOR-BIT (not just
    // bounds-checks it), and two pipeline runs disagree only if the
    // corpus actually changed. The exact count rides along here for
    // the driver's cross-check; at 100 TB one drops n_exact and ships
    // only 64 longs per (lang, partition) — the token stream itself
    // is never shuffled on the sketch path.
    Entry("t_kmv_distinct",
      (spark, dir) => {
        import graft.functions.KmvSketch
        val toks = Registry.table(spark, dir, "documents")
          .select(col("lang"),
            explode(TextFunctions.tokens(col("text"))).as("tok"))
        toks
          .select(col("lang"), col("tok"),
            TextFunctions.fingerprint64(col("tok")).as("h"))
          .groupBy(col("lang"))
          .agg(countDistinct(col("tok")).as("n_exact"),
            KmvSketch.kmvSketch(col("h")).as("sk"))
          .select(col("lang"), col("n_exact"),
            KmvSketch.estimate(col("sk")).as("n_kmv"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH tok AS (SELECT lang, unnest($tokSql) AS tok
        |  FROM documents),
        |th AS (SELECT lang, tok, ${fp64Sql("tok")} AS h FROM tok),
        |ex AS (SELECT lang, count(DISTINCT tok) AS n_exact FROM tok
        |  GROUP BY lang),
        |kmv AS ${graft.functions.KmvSketch.oracleEstimateSql("th", "lang", "h")}
        |SELECT ex.lang, ex.n_exact, kmv.n_kmv
        |FROM ex JOIN kmv USING (lang) ORDER BY ex.lang""".stripMargin)),

    // SKETCH-BASED DECONTAMINATION ESTIMATE — t_contamination's scale
    // twin: train/test shingle overlap WITHOUT the equi-join. Each
    // split reduces to its k=64-min hash set; the union's k-min set is
    // provably contained in the two sketches' union (closure), and for
    // any of its members h, h ∈ train ⟺ h ∈ train's sketch — so the
    // coincidence ratio C/|U| estimates Jaccard and C·est(A∪B)/|U|
    // the shared-shingle count, from 2×512 bytes. At 100 TB the exact
    // columns drop and each side's sketch comes from its own corpus
    // scan (even separate clusters — sketches are mailable); the
    // whole estimator is deterministic integer/IEEE arithmetic, so
    // DuckDB re-derives every column bit-for-bit from the raw corpus.
    Entry("t_kmv_contamination",
      (spark, dir) => {
        import graft.functions.KmvSketch
        val sh = Registry.table(spark, dir, "documents")
          .select(col("doc_id"), col("text"))
          .withColumn("split", TextFunctions.splitAssign(col("doc_id")))
          .filter(col("split") =!= "val")
          .select(col("split"), TextFunctions.tokens(col("text")).as("toks"))
          .select(col("split"), explode(array_distinct(
            TextFunctions.shingles3FromTokens(col("toks")))).as("sh"))
          .select(col("split"), TextFunctions.fingerprint64(col("sh")).as("fp"))
          // every downstream consumer needs only the distinct (split,
          // fp) set — materialize it ONCE (the tokenize+shingle+md5
          // scan is the dominant cost; without this the two sketch
          // sides and both exact-intersection branches would re-run it
          // four times)
          .distinct().localCheckpoint()
        // k=256 (2 KB/side): the coincidence count C ~ Binomial(k, J)
        // is the noisy term at low overlap — k=64 put C's rse near 70%
        // on this corpus's J≈0.05; 256 quarters the variance while the
        // sketches stay mailable
        val k = 256
        def side(s: String) = sh.filter(col("split") === s)
          .agg(count(col("fp")).as(s"n_${s}_exact"), // fp already distinct
            KmvSketch.estimate(KmvSketch.kmvSketch(col("fp"), k), k)
              .as(s"n_${s}_kmv"),
            KmvSketch.kmvHashes(col("fp"), k).as(s"${s}_hs"))
        val both = side("train").crossJoin(side("test"))
          .withColumn("u", KmvSketch.unionMin(col("train_hs"), col("test_hs"), k))
          .withColumn("n_union_kmv", KmvSketch.estimateFromHashes(col("u"), k))
          .withColumn("c",
            KmvSketch.coincidences(col("u"), col("train_hs"), col("test_hs")))
          .withColumn("jaccard_kmv",
            when(size(col("u")) === 0, lit(0.0))
              .otherwise(round(col("c") / size(col("u")), 6)))
          .withColumn("n_inter_kmv",
            when(size(col("u")) === 0, lit(0L)).otherwise(
              floor(col("c") * col("n_union_kmv") / size(col("u")))
                .cast("long")))
        val nInterExact = sh.filter(col("split") === "train")
          .select(col("fp"))
          .join(sh.filter(col("split") === "test").select(col("fp")),
            Seq("fp"))
          .agg(count(lit(1)).as("n_inter_exact"))
        both.crossJoin(nInterExact)
          .select(col("n_train_exact"), col("n_test_exact"),
            col("n_inter_exact"), col("n_train_kmv"), col("n_test_kmv"),
            col("n_union_kmv"), col("c"), col("jaccard_kmv"),
            col("n_inter_kmv"))
      },
      Some(s"""WITH b AS (SELECT doc_id, text,
        |  ${TextFunctions.splitCaseSql(TextFunctions.splitBucketSql("doc_id"))} AS split
        |  FROM documents),
        |sh AS (SELECT DISTINCT split, ${fp64Sql("sh")} AS fp
        |  FROM (SELECT split,
        |    unnest(list_distinct(${DedupOps.shinglesListSql})) AS sh
        |    FROM b WHERE split <> 'val')),
        |tr AS (SELECT fp FROM sh WHERE split = 'train'),
        |te AS (SELECT fp FROM sh WHERE split = 'test'),
        |trk AS (SELECT fp, row_number() OVER (ORDER BY fp) AS rn FROM tr),
        |tek AS (SELECT fp, row_number() OVER (ORDER BY fp) AS rn FROM te),
        |un AS (SELECT fp, row_number() OVER (ORDER BY fp) AS rn
        |  FROM (SELECT fp FROM tr UNION SELECT fp FROM te)),
        |uk AS (SELECT fp FROM un WHERE rn <= 256),
        |est AS (SELECT
        |  (SELECT CASE WHEN max(rn) < 256 THEN max(rn)
        |     ELSE CAST(floor(255.0 * 1152921504606846976.0 /
        |       CAST(GREATEST(max(CASE WHEN rn = 256 THEN fp END), 1) AS DOUBLE)) AS BIGINT) END
        |   FROM trk) AS n_train_kmv,
        |  (SELECT CASE WHEN max(rn) < 256 THEN max(rn)
        |     ELSE CAST(floor(255.0 * 1152921504606846976.0 /
        |       CAST(GREATEST(max(CASE WHEN rn = 256 THEN fp END), 1) AS DOUBLE)) AS BIGINT) END
        |   FROM tek) AS n_test_kmv,
        |  (SELECT CASE WHEN max(rn) < 256 THEN max(rn)
        |     ELSE CAST(floor(255.0 * 1152921504606846976.0 /
        |       CAST(GREATEST(max(CASE WHEN rn = 256 THEN fp END), 1) AS DOUBLE)) AS BIGINT) END
        |   FROM un) AS n_union_kmv,
        |  (SELECT count(*) FROM uk
        |   WHERE fp IN (SELECT fp FROM tr) AND fp IN (SELECT fp FROM te))
        |    AS c,
        |  (SELECT count(*) FROM uk) AS nu)
        |SELECT
        |  (SELECT count(*) FROM tr) AS n_train_exact,
        |  (SELECT count(*) FROM te) AS n_test_exact,
        |  (SELECT count(*) FROM tr WHERE fp IN (SELECT fp FROM te))
        |    AS n_inter_exact,
        |  n_train_kmv, n_test_kmv, n_union_kmv, c,
        |  CASE WHEN nu = 0 THEN 0.0 ELSE round(c / nu, 6) END AS jaccard_kmv,
        |  CASE WHEN nu = 0 THEN 0 ELSE
        |    CAST(floor(c * n_union_kmv / nu) AS BIGINT) END AS n_inter_kmv
        |FROM est""".stripMargin)),

    // SEQUENCE PACKING — the concatenate-and-chunk step of LM training
    // prep: documents are concatenated in a deterministic order and
    // cut into fixed 512-token context windows; each document is
    // assigned the window its first token lands in. Packing is
    // inherently sequential, so the production shape shards it: the
    // running token offset is windowed over (lang, shard of 1,000
    // docs), never over a whole language — at 100 TB that keeps
    // per-reducer work bounded at shard size (5 language partitions
    // would otherwise serialize the corpus through 5 reducers) at the
    // cost of at most one under-filled window per shard boundary,
    // which is how real packers trade too. Pure integer arithmetic
    // throughout — the oracle mirrors it exactly.
    Entry("t_seq_packing",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents")
          .select(col("lang"), col("doc_id"),
            TextFunctions.tokenCount(col("text")).as("n_tokens"))
          .withColumn("shard", expr("doc_id div 1000"))
        val w = Window.partitionBy(col("lang"), col("shard"))
          .orderBy(col("doc_id"))
        d.withColumn("offset",
            sum(col("n_tokens")).over(w) - col("n_tokens"))
          .withColumn("bin", expr("offset div 512"))
          .groupBy(col("lang"), col("shard"), col("bin"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("sum_tokens"),
            min(col("doc_id")).as("first_doc"))
          .orderBy(col("lang"), col("shard"), col("bin"))
      },
      Some(s"""WITH d AS (SELECT lang, doc_id,
        |  CAST(floor(doc_id / 1000) AS BIGINT) AS shard,
        |  len($tokSql) AS n_tokens FROM documents),
        |o AS (SELECT lang, shard, doc_id, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS tok_off
        |  FROM d)
        |SELECT lang, shard, CAST(floor(tok_off / 512) AS BIGINT) AS bin,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  min(doc_id) AS first_doc
        |FROM o GROUP BY 1, 2, 3 ORDER BY lang, shard, bin""".stripMargin)),

    // PACKING BOUNDARY SPANS — the metadata the trainer actually
    // consumes from a packed dataset: for every 512-token context
    // window, the ordered (doc_id, start_tok, len) segments that fill
    // it, i.e. the attention-mask / position-reset input of
    // packed-sequence training. Unlike t_seq_packing's whole-doc
    // window assignment, a document here SPANS every window its token
    // range [offset, offset+n) overlaps — one output row per
    // (doc × overlapped window) with the in-window start and the
    // clipped length, so each window's spans sum exactly to its fill.
    // Same shard-bounded running-offset window as t_seq_packing (the
    // 100 TB sequentiality story is identical); the explode fans a doc
    // out to ceil(n/512)+1 windows at most, all integer arithmetic.
    Entry("t_seq_packing_spans",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents")
          .select(col("lang"), col("doc_id"),
            TextFunctions.tokenCount(col("text")).as("n_tokens"))
          .withColumn("shard", expr("doc_id div 1000"))
          .filter(col("n_tokens") > 0)
        val w = Window.partitionBy(col("lang"), col("shard"))
          .orderBy(col("doc_id"))
        d.withColumn("offset",
            sum(col("n_tokens")).over(w) - col("n_tokens"))
          .withColumn("bin",
            explode(expr("sequence(offset div 512, (offset + n_tokens - 1) div 512)")))
          .select(col("lang"), col("shard"), col("bin"), col("doc_id"),
            (greatest(col("offset"), col("bin") * 512) - col("bin") * 512)
              .as("start_tok"),
            (least(col("offset") + col("n_tokens"), (col("bin") + 1) * 512)
              - greatest(col("offset"), col("bin") * 512)).as("len"))
          .orderBy(col("lang"), col("shard"), col("bin"), col("start_tok"))
      },
      Some(s"""WITH d AS (SELECT lang, doc_id,
        |  CAST(floor(doc_id / 1000) AS BIGINT) AS shard,
        |  len($tokSql) AS n_tokens FROM documents),
        |o AS (SELECT lang, shard, doc_id, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS tok_off
        |  FROM d WHERE n_tokens > 0)
        |SELECT lang, shard, bin, doc_id,
        |  GREATEST(tok_off, bin * 512) - bin * 512 AS start_tok,
        |  LEAST(tok_off + n_tokens, (bin + 1) * 512)
        |    - GREATEST(tok_off, bin * 512) AS len
        |FROM o, unnest(generate_series(
        |  CAST(floor(tok_off / 512) AS BIGINT),
        |  CAST(floor((tok_off + n_tokens - 1) / 512) AS BIGINT))) g(bin)
        |ORDER BY lang, shard, bin, start_tok""".stripMargin)),

    // OVERLAPPING CONTEXT-WINDOW CHUNKING — the retrieval/embedding
    // prep twin of t_seq_packing: each document is cut into 128-token
    // windows advancing by a 96-token stride (32-token overlap, the
    // standard boundary-context hedge for RAG/embedding corpora). One
    // scan, one explode — rows ∝ tokens/stride, no shuffle, no
    // window function (chunk offsets are per-document arithmetic,
    // unlike packing's cross-document running offset), so at 100 TB
    // this is embarrassingly parallel and chunk TEXT never rides a
    // shuffle: each chunk is reduced to its md5 fingerprint in the
    // scan projection, which also hash-checks that both engines slice
    // identical token ranges.
    Entry("t_chunk_overlap",
      (spark, dir) => {
        val win = 128; val stride = 96
        Registry.table(spark, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .withColumn("n", size(col("toks")).cast("long"))
          .withColumn("start_tok",
            explode(expr(s"sequence(0L, n - 1, ${stride}L)")))
          .withColumn("len",
            least(lit(win.toLong), col("n") - col("start_tok")))
          .select(col("doc_id"),
            expr(s"start_tok div $stride").as("chunk_id"),
            col("start_tok"), col("len"),
            md5(concat_ws(" ",
              expr("slice(toks, CAST(start_tok + 1 AS INT), CAST(len AS INT))")))
              .as("fp"))
          .orderBy(col("doc_id"), col("chunk_id"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $tokSql AS toks,
        |  CAST(len($tokSql) AS BIGINT) AS n FROM documents),
        |c AS (SELECT doc_id, n, toks,
        |  unnest(generate_series(0, n - 1, 96)) AS start_tok FROM t)
        |SELECT doc_id, start_tok // 96 AS chunk_id, start_tok,
        |  LEAST(128, n - start_tok) AS len,
        |  md5(array_to_string(
        |    toks[(start_tok + 1):(start_tok + LEAST(128, n - start_tok))],
        |    ' ')) AS fp
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin)),

    // COUNT-MIN SKETCH HEAVY HITTERS — the frequency member of the
    // sketch family (KMV = cardinality, MinHash/LSH = similarity):
    // token frequencies estimated from a d=4 × w=1024 counter matrix
    // instead of a full token groupBy. The (row, bucket)-keyed counts
    // ARE the sketch, and counter matrices merge by ADDITION — exactly
    // what map-side partial aggregation does to counts — so at 100 TB
    // the token stream collapses to ≤ d·w counters per partition
    // before any shuffle, and the converged sketch is 4,096 longs
    // regardless of vocabulary. The exact top-20 ride along as probes:
    // n_cms ≥ n_exact always (collisions only add), within 2N/w with
    // probability 1 − 2^−d. Deterministic integer arithmetic end to
    // end; the oracle rebuilds the identical matrix.
    Entry("t_cms_heavy_hitters",
      (spark, dir) => {
        import graft.functions.SketchFunctions
        val toks = Registry.table(spark, dir, "documents")
          .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
        val cms = toks
          .select(explode(SketchFunctions.cmsCoords(
            TextFunctions.tokenHash(col("tok")))).as("rb"))
          .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
          .agg(count(lit(1)).as("cnt"))
        val top = toks.groupBy(col("tok"))
          .agg(count(lit(1)).as("n_exact"))
          .orderBy(col("n_exact").desc, col("tok"))
          .limit(20)
        top
          .select(col("tok"), col("n_exact"),
            explode(SketchFunctions.cmsCoords(
              TextFunctions.tokenHash(col("tok")))).as("rb"))
          .select(col("tok"), col("n_exact"),
            col("rb.r").as("r"), col("rb.b").as("b"))
          .join(cms, Seq("r", "b"))
          .groupBy(col("tok"), col("n_exact"))
          .agg(min(col("cnt")).as("n_cms"))
          .withColumn("overestimate", col("n_cms") - col("n_exact"))
          .orderBy(col("n_exact").desc, col("tok"))
      },
      Some {
        import graft.functions.SketchFunctions.{P, cmsCoeffSql, cmsWidth}
        s"""WITH t AS (SELECT unnest($tokSql) AS tok FROM documents),
        |h AS (SELECT tok,
        |  CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS th
        |  FROM t),
        |cms AS (SELECT c.r, (c.a * th + c.b) % $P % $cmsWidth AS b,
        |    count(*) AS cnt
        |  FROM h CROSS JOIN $cmsCoeffSql AS c(r, a, b)
        |  GROUP BY 1, 2),
        |top AS (SELECT tok, count(*) AS n_exact FROM t
        |  GROUP BY tok ORDER BY n_exact DESC, tok LIMIT 20),
        |probe AS (SELECT top.tok, top.n_exact, c.r,
        |    (c.a * CAST(concat('0x', substr(md5(top.tok), 1, 8)) AS BIGINT)
        |      + c.b) % $P % $cmsWidth AS b
        |  FROM top CROSS JOIN $cmsCoeffSql AS c(r, a, b))
        |SELECT probe.tok, probe.n_exact, min(cms.cnt) AS n_cms,
        |  min(cms.cnt) - probe.n_exact AS overestimate
        |FROM probe JOIN cms ON cms.r = probe.r AND cms.b = probe.b
        |GROUP BY probe.tok, probe.n_exact
        |ORDER BY probe.n_exact DESC, probe.tok""".stripMargin
      }),

    // BLOOM-FILTER CONTAMINATION PRE-SCREEN — the membership member of
    // the sketch family, in its canonical pipeline role: screen test
    // documents against the TRAIN shingle set through a k=4 ×
    // m=65,536-bit bloom filter before paying the exact join. The
    // filter is built as a distinct set-bit relation (at 100 TB the
    // 8 KB bit array broadcasts and probing is scan-local; here the
    // ≤65k-row position set broadcast-joins, the same plan); a shingle
    // screens positive iff ALL k of its positions are set. No false
    // negatives — per doc, bloom_hits >= n_contaminated always (the
    // exact count on the same 32-bit hash key rides along, so the
    // false-positive overhead is measured, not assumed). Deterministic
    // integer arithmetic; the oracle rebuilds the identical bit set.
    Entry("t_bloom_contamination",
      (spark, dir) => {
        import graft.functions.SketchFunctions
        val sh = Registry.table(spark, dir, "documents")
          .select(col("doc_id"), col("text"))
          .withColumn("split", TextFunctions.splitAssign(col("doc_id")))
          .filter(col("split") =!= "val")
          .select(col("doc_id"), col("split"),
            TextFunctions.tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("split"), explode(array_distinct(
            TextFunctions.shingles3FromTokens(col("toks")))).as("sh"))
          .select(col("doc_id"), col("split"),
            TextFunctions.tokenHash(col("sh")).as("th"))
        val trainTh = sh.filter(col("split") === "train")
          .select(col("th")).distinct()
        val bits = trainTh
          .select(explode(SketchFunctions.bloomPositions(col("th")))
            .as("pos")).distinct()
          .withColumn("set", lit(1))
        val test = sh.filter(col("split") === "test")
        val bloomHits = test
          .select(col("doc_id"), col("th"),
            explode(SketchFunctions.bloomPositions(col("th"))).as("pos"))
          .join(broadcast(bits), Seq("pos"), "left")
          .groupBy(col("doc_id"), col("th"))
          .agg((count(col("set")) === SketchFunctions.bloomK)
            .cast("int").as("hit"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"),
            sum(col("hit")).as("n_bloom_hits"))
        val exactHits = test
          .join(trainTh.withColumn("intrain", lit(1)), Seq("th"), "left")
          .groupBy(col("doc_id"))
          .agg(count(col("intrain")).as("n_contaminated"))
        bloomHits.join(exactHits, Seq("doc_id"))
          .select(col("doc_id"), col("n_shingles"), col("n_contaminated"),
            col("n_bloom_hits"),
            (col("n_bloom_hits") - col("n_contaminated"))
              .as("bloom_false_pos"))
          .orderBy(col("doc_id"))
      },
      Some {
        import graft.functions.SketchFunctions.{P, bloomCoeffSql, bloomK, bloomM}
        s"""WITH b AS (SELECT doc_id, text,
        |  ${TextFunctions.splitCaseSql(
             TextFunctions.splitBucketSql("doc_id"))} AS split
        |  FROM documents),
        |sh AS (SELECT doc_id, split,
        |  CAST(concat('0x', substr(md5(sh), 1, 8)) AS BIGINT) AS th
        |  FROM (SELECT doc_id, split,
        |    unnest(list_distinct(${DedupOps.shinglesListSql})) AS sh
        |    FROM b WHERE split <> 'val')),
        |tr AS (SELECT DISTINCT th FROM sh WHERE split = 'train'),
        |bits AS (SELECT DISTINCT (c.a * th + c.b) % $P % $bloomM AS pos
        |  FROM tr CROSS JOIN $bloomCoeffSql AS c(r, a, b)),
        |te AS (SELECT doc_id, th FROM sh WHERE split = 'test'),
        |hits AS (SELECT doc_id, th,
        |    CASE WHEN count(bits.pos) = $bloomK
        |      THEN 1 ELSE 0 END AS hit
        |  FROM (SELECT te.doc_id, te.th,
        |          (c.a * te.th + c.b) % $P % $bloomM AS pos
        |        FROM te CROSS JOIN $bloomCoeffSql AS c(r, a, b)) p
        |  LEFT JOIN bits ON bits.pos = p.pos
        |  GROUP BY doc_id, th),
        |bl AS (SELECT doc_id, count(*) AS n_shingles,
        |    CAST(sum(hit) AS BIGINT) AS n_bloom_hits
        |  FROM hits GROUP BY doc_id),
        |ex AS (SELECT te.doc_id, count(tr.th) AS n_contaminated
        |  FROM te LEFT JOIN tr ON tr.th = te.th GROUP BY te.doc_id)
        |SELECT bl.doc_id, n_shingles, n_contaminated, n_bloom_hits,
        |  n_bloom_hits - n_contaminated AS bloom_false_pos
        |FROM bl JOIN ex ON ex.doc_id = bl.doc_id
        |ORDER BY bl.doc_id""".stripMargin
      }),

    // PERPLEXITY-BAND FILTERING (CCNet, Wenzek et al. 2020, public):
    // score every document with the corpus-trained unigram LM
    // (t_unigram_lm's model — same joins), then classify into
    // head/middle/tail PER LANGUAGE against the language's mean score
    // — CCNet trains per-language LMs and keeps the head/middle
    // bands; the tail is the low-probability (high-perplexity) text a
    // pretraining mix drops. Every comparison is INTEGER: the per-doc
    // score is fixed-point-quantized scan-side (micro =
    // floor(p·10⁶ + 0.5), the t_bigram_lm idiom), and the band test
    // cross-multiplies instead of dividing (micro·2n < msum ⟺
    // micro < mean/2), so band boundaries can never float-drift
    // between engines. Shuffle structure = the unigram row's plus one
    // ≤5-row per-language stat broadcast — the banding itself adds no
    // data-sized exchange, and at 100 TB the decision column fuses
    // into the same pass that writes the curation manifest.
    Entry("t_perplexity_filter",
      (spark, dir) => {
        val toks = Registry.table(spark, dir, "documents")
          .select(col("doc_id"),
            explode(TextFunctions.tokens(col("text"))).as("tok"))
        val vocab = toks.groupBy(col("tok"))
          .agg(count(lit(1)).as("cnt"))
        perplexityBandsFrom(spark, dir, vocab)
      },
      Some(perplexityBandsOracleSql)),

    // SOURCE-LEVEL QUALITY FILTERING — the coarse-grained curation
    // pass the public RefinedWeb/C4 recipes run BEFORE any per-doc
    // rule: score every source (site/feed/dump shard) by its MEAN
    // document quality and drop whole sources below the bar, because
    // at 100 TB a reputation decision per source is 20 rows where a
    // decision per document is billions — and low-quality sources are
    // overwhelmingly low-quality throughout. Per-doc quality (the
    // t_quality formula) fixed-point-quantizes scan-side; the keep
    // rule cross-multiplies against the corpus mean (q_sum·t_n ≥
    // t_sum·n_docs ⟺ source mean ≥ corpus mean — the demonstration
    // bar; production tunes the ratio), so the whole decision chain
    // is exact integers. One partial-agg shuffle on source + a 1-row
    // corpus-total broadcast; sum(doc_id) per source hash-checks
    // membership.
    Entry("t_source_filter",
      (spark, dir) => {
        val per = sourceQmicro(Registry.table(spark, dir, "documents"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("qmicro")).as("q_sum"),
            sum(col("doc_id")).as("sum_ids"))
        sourceFilterFrom(per)
      },
      Some(sourceFilterOracleSql)),

    // TEMPERATURE-SCALED DOMAIN MIXING (α = 0.5) — the multilingual
    // rebalancing rule the public XLM-R/mT5 recipes sample with:
    // domain weight ∝ count^α, so low-resource languages are
    // UP-weighted relative to their raw share (α = 1 is t_domain_mix's
    // proportional quota; α = 0 is uniform). Same scalable machinery
    // as t_domain_mix — capacity = min over domains of what each can
    // fill at its weight, selection by deterministic per-doc hash
    // threshold against a ≤5-row broadcast quota table, never a
    // per-domain sort — with the weight itself data-derived:
    // w = floor(sqrt(count)), integer-exact in both engines (IEEE
    // sqrt of an integer-valued double is correctly rounded, floor of
    // it identical), so the whole quota chain stays on integers.
    Entry("t_domain_mix_temp",
      (spark, dir) => {
        val counts = Registry.table(spark, dir, "documents")
          .groupBy(col("lang")).agg(count(lit(1)).as("c"))
        tempMixFrom(spark, dir, counts)
      },
      Some(tempMixOracleSql))
  )

  /** The temperature-scaled (α = 0.5) quota chain + selection over a
    * SUPPLIED per-lang count table — shared by the batch
    * t_domain_mix_temp (counts = one groupBy over the corpus) and the
    * streamed s59 twin (counts = the converged native streaming
    * aggregation state): weight w = floor(sqrt(count)) is
    * integer-exact in both engines, capacity/threshold derive on
    * integers, selection is the scan-local md5-threshold filter
    * against the ≤5-row broadcast quota table. */
  private[queries] def tempMixFrom(spark: SparkSession, dir: String,
                                   counts: DataFrame): DataFrame = {
    val d = Registry.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"))
      .withColumn("u_ppm",
        TextFunctions.tokenHash(col("doc_id").cast("string")) % 1000000)
    val cw = counts
      .withColumn("w", floor(sqrt(col("c"))).cast("long"))
    val cap = cw.select(min(expr("c * 1000000 div w")).as("t"))
    val quota = cw.crossJoin(broadcast(cap))
      .withColumn("thr_ppm",
        expr("least(c, w * t div 1000000) * 1000000 div c"))
      .select(col("lang"), col("c"), col("w"), col("thr_ppm"))
    d.join(broadcast(quota), "lang")
      .filter(col("u_ppm") < col("thr_ppm"))
      .groupBy(col("lang"), col("c").as("n_docs"), col("w"),
        col("thr_ppm"))
      .agg(count(lit(1)).as("n_selected"),
        sum(col("doc_id")).as("sum_sel_ids"))
      .select(col("lang"), col("n_docs"), col("w"), col("thr_ppm"),
        col("n_selected"), col("sum_sel_ids"))
      .orderBy(col("lang"))
  }

  /** Sentinel token whose "document frequency" IS the corpus size:
    * emitted once per document by [[tfidfDocTokens]], so the df model
    * carries n_docs inside itself and a streamed model needs no
    * second aggregation (multiple streaming aggs are unsupported;
    * the s55 Σcnt trick, applied to document counting). A token
    * containing a space is impossible — the tokenizer splits on
    * non-[a-z0-9] — so the sentinel can never collide. */
  private[queries] val docCountTok = " n"

  /** Distinct (doc_id, tok) pairs computed SCAN-LOCALLY (per-doc
    * array_distinct — no dedup shuffle, where the old countDistinct
    * ran distinct's extra exchange) plus one [[docCountTok]] sentinel
    * per document — shared by the batch t_tfidf_top model build and
    * the streamed s60 twin's microbatch projection. One token-keyed
    * count over these rows IS the df model, n_docs included. */
  private[queries] def tfidfDocTokens(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
      explode(concat(array(lit(docCountTok)),
        array_distinct(filter(split(lower(col("text")), "[^a-z0-9]+"),
          t => length(t) > 0)))).as("tok"))

  /** The BM25-ish scoring + per-doc top-5 tail over a SUPPLIED df
    * model (tok → df, with [[docCountTok]] carrying n_docs) — shared
    * by the batch t_tfidf_top and the streamed s60 twin: slim
    * (tok, df) equi-join onto the per-doc tf rows, 1-row corpus-size
    * broadcast, per-DOC top-5 window (the reducer count scales with
    * the corpus here, unlike the fixed query panels — a window is the
    * right shape). */
  private[queries] def tfidfTopFrom(spark: SparkSession, dir: String,
                                    dfModel: DataFrame): DataFrame = {
    val d = Registry.table(spark, dir, "documents")
    val toks = d.select(col("doc_id"),
        explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val n = dfModel.filter(col("tok") === lit(docCountTok))
      .select(col("df").as("n_docs"))
    val df = dfModel.filter(col("tok") =!= lit(docCountTok))
    val scored = tf.join(df, Seq("tok"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * (col("n_docs") - col("df") + 0.5)
          / (col("df") + 0.5), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tok"))
    scored.withColumn("r", row_number().over(w))
      .filter(col("r") <= 5)
      .select(col("doc_id"), col("r"), col("tok"), col("tf"),
        col("df"), col("score"))
      .orderBy(col("doc_id"), col("r"))
  }

  /** Shared with StreamingOps (s60): the streamed df model must
    * reproduce exactly this batch keyword report. */
  private[queries] val tfidfTopOracleSql: String =
    """WITH t AS (SELECT doc_id,
      |  unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok
      |  FROM documents),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t
      |  WHERE length(tok) > 0 GROUP BY 1, 2),
      |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM t
      |  WHERE length(tok) > 0 GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |s AS (SELECT tf.doc_id, tf.tok, tf.tf, df.df,
      |    round(tf.tf * (n.n_docs - df.df + 0.5) / (df.df + 0.5), 6) AS score
      |  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n)
      |SELECT doc_id, r, tok, tf, df, score FROM (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |    ORDER BY score DESC, tok) AS r FROM s)
      |WHERE r <= 5 ORDER BY doc_id, r""".stripMargin

  /** Shared with StreamingOps (s59): the streamed count state must
    * reproduce exactly this batch temperature-mix decision. */
  private[queries] val tempMixOracleSql: String =
    """WITH d AS (SELECT doc_id, lang,
      |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |      AS BIGINT) % 1000000 AS u_ppm
      |  FROM documents),
      |c AS (SELECT lang, count(*) AS c,
      |    CAST(floor(sqrt(count(*))) AS BIGINT) AS w FROM d GROUP BY 1),
      |cap AS (SELECT min(c.c * 1000000 // c.w) AS t FROM c),
      |q AS (SELECT c.lang, c.c, c.w,
      |    LEAST(c.c, c.w * cap.t // 1000000) * 1000000 // c.c AS thr_ppm
      |  FROM c, cap)
      |SELECT d.lang, q.c AS n_docs, q.w, q.thr_ppm,
      |  count(*) AS n_selected,
      |  CAST(sum(d.doc_id) AS BIGINT) AS sum_sel_ids
      |FROM d JOIN q ON d.lang = q.lang AND d.u_ppm < q.thr_ppm
      |GROUP BY 1, 2, 3, 4 ORDER BY d.lang""".stripMargin

  /** The perplexity-band tail over a SUPPLIED unigram model (tok,
    * cnt) — shared by the batch t_perplexity_filter (model = one
    * groupBy over the corpus tokens) and the streamed s55 twin (model
    * = the converged native streaming aggregation state): score every
    * doc against the model (mean token probability, micro-quantized),
    * then classify head/middle/tail per language against the
    * language's mean with integer cross-multiplied band tests. The
    * corpus total derives FROM the model (Σ cnt = total tokens), so
    * the supplied table is the complete training state. */
  private[queries] def perplexityBandsFrom(spark: SparkSession,
                                           dir: String,
                                           vocab: DataFrame): DataFrame = {
    val d = Registry.table(spark, dir, "documents")
    val toks = d.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
    val total = vocab.agg(sum(col("cnt")).as("total"))
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val scored = tf.join(vocab, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("cnt")).as("wsum"),
        sum(col("tf")).as("n_tokens"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        floor(col("wsum") * lit(1000000L) /
          (col("n_tokens") * col("total")) + lit(0.5)).as("micro"))
    val withLang = scored
      .join(d.select(col("doc_id"), col("lang")), "doc_id")
    val stats = withLang.groupBy(col("lang"))
      .agg(sum(col("micro")).as("msum"), count(lit(1)).as("n"))
    withLang.join(broadcast(stats), "lang")
      .withColumn("bucket",
        when(col("micro") * 2 * col("n") < col("msum"), lit("tail"))
          .when(col("micro") * 2 * col("n") >= col("msum") * 3,
            lit("head"))
          .otherwise(lit("middle")))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("sum_ids"),
        min(col("micro")).as("min_micro"),
        max(col("micro")).as("max_micro"))
      .orderBy(col("lang"), col("bucket"))
  }

  /** Shared with StreamingOps (s55): the streamed vocab state must
    * reproduce exactly this batch banding decision. */
  private[queries] val perplexityBandsOracleSql: String =
    s"""WITH t AS (SELECT doc_id, unnest($tokSql) AS tok
       |  FROM documents),
       |vocab AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
       |tot AS (SELECT count(*) AS total FROM t),
       |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t
       |  GROUP BY doc_id, tok),
       |ds AS (SELECT tf.doc_id,
       |    CAST(floor(CAST(sum(tf.tf * vocab.cnt) AS BIGINT) * 1000000
       |      / (CAST(sum(tf.tf) AS BIGINT) * tot.total) + 0.5) AS BIGINT)
       |      AS micro
       |  FROM tf JOIN vocab USING (tok), tot
       |  GROUP BY tf.doc_id, tot.total),
       |dl AS (SELECT ds.doc_id, d.lang, ds.micro
       |  FROM ds JOIN documents d USING (doc_id)),
       |st AS (SELECT lang, CAST(sum(micro) AS BIGINT) AS msum,
       |    count(*) AS n FROM dl GROUP BY lang)
       |SELECT dl.lang,
       |  CASE WHEN dl.micro * 2 * st.n < st.msum THEN 'tail'
       |       WHEN dl.micro * 2 * st.n >= st.msum * 3 THEN 'head'
       |       ELSE 'middle' END AS bucket,
       |  count(*) AS n_docs, CAST(sum(dl.doc_id) AS BIGINT) AS sum_ids,
       |  min(dl.micro) AS min_micro, max(dl.micro) AS max_micro
       |FROM dl JOIN st USING (lang)
       |GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin

  /** The domain-mix quota chain + selection over a SUPPLIED per-lang
    * count table — shared by the batch t_domain_mix (counts = one
    * groupBy over the corpus) and the streamed s54 twin (counts = the
    * converged native streaming aggregation state): capacity T =
    * min over domains of count/share, per-domain quota taken by the
    * deterministic md5 threshold, selection a scan-local filter
    * against the ≤5-row broadcast quota table. */
  /** The ONE proportional-mix weight table — t_domain_mix,
    * pipe_training_mix, and the streamed s54 twin all consume this
    * (and [[mixQuota]]) so a weight change cannot silently diverge
    * the compose from the unit entry. */
  private[queries] val mixWeights: Seq[(String, Int)] =
    Seq(("en", 40), ("de", 15), ("es", 15), ("fr", 15), ("zh", 15))

  /** The count → capacity → thr_ppm quota chain over a SUPPLIED
    * (lang, c) count table: capacity T = min over domains of
    * count·100/weight, per-domain threshold the integer ppm a
    * deterministic per-doc hash is tested against. Returns the ≤5-row
    * (lang, c, thr_ppm) quota table (callers broadcast it). */
  private[queries] def mixQuota(spark: SparkSession,
                                counts: DataFrame): DataFrame = {
    val wdf = spark.createDataFrame(mixWeights).toDF("lang", "w")
    val cw = counts.join(broadcast(wdf), "lang")
    val cap = cw.select(min(expr("c * 100 div w")).as("t"))
    cw.crossJoin(broadcast(cap))
      .withColumn("thr_ppm",
        expr("least(c, w * t div 100) * 1000000 div c"))
      .select(col("lang"), col("c"), col("thr_ppm"))
  }

  private[queries] def domainMixFrom(spark: SparkSession, dir: String,
                                     counts: DataFrame): DataFrame = {
    val d = Registry.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"))
      .withColumn("u_ppm",
        TextFunctions.tokenHash(col("doc_id").cast("string")) % 1000000)
    val quota = mixQuota(spark, counts)
    d.join(broadcast(quota), "lang")
      .filter(col("u_ppm") < col("thr_ppm"))
      .groupBy(col("lang"), col("c").as("n_docs"), col("thr_ppm"))
      .agg(count(lit(1)).as("n_selected"),
        sum(col("doc_id")).as("sum_sel_ids"))
      .select(col("lang"), col("n_docs"), col("thr_ppm"),
        col("n_selected"), col("sum_sel_ids"))
      .orderBy(col("lang"))
  }

  /** Shared with StreamingOps (s54): the streamed count state must
    * reproduce exactly this batch mixing decision. */
  private[queries] val domainMixOracleSql: String =
    """WITH w(lang, w) AS (VALUES ('en', 40), ('de', 15),
      |  ('es', 15), ('fr', 15), ('zh', 15)),
      |d AS (SELECT doc_id, lang,
      |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |      AS BIGINT) % 1000000 AS u_ppm
      |  FROM documents),
      |c AS (SELECT lang, count(*) AS c FROM d GROUP BY 1),
      |cap AS (SELECT min(c.c * 100 // w.w) AS t
      |  FROM c JOIN w USING (lang)),
      |q AS (SELECT c.lang, c.c,
      |    LEAST(c.c, w.w * cap.t // 100) * 1000000 // c.c AS thr_ppm
      |  FROM c JOIN w USING (lang), cap)
      |SELECT d.lang, q.c AS n_docs, q.thr_ppm,
      |  count(*) AS n_selected,
      |  CAST(sum(d.doc_id) AS BIGINT) AS sum_sel_ids
      |FROM d JOIN q ON d.lang = q.lang AND d.u_ppm < q.thr_ppm
      |GROUP BY 1, 2, 3 ORDER BY d.lang""".stripMargin

  /** Scan-side fixed-point per-doc quality (the t_quality formula,
    * micro-quantized) tagged with its source — shared by the batch
    * t_source_filter aggregation and the streamed s56 twin's
    * microbatch projection. */
  private[queries] def sourceQmicro(d: DataFrame): DataFrame = {
    val t = TextFunctions.tokens(col("text"))
    val qm = floor((lit(0.5) *
      (size(array_distinct(t)).cast("double") /
        size(t).cast("double")) +
      lit(0.5) * least(lit(1.0),
        length(col("text")).cast("double") / lit(200.0))) *
      lit(1000000d) + lit(0.5))
    d.select(col("source"), col("doc_id"), qm.as("qmicro"))
  }

  /** The source-reputation keep rule over a SUPPLIED per-source stat
    * table (source, n_docs, q_sum, sum_ids) — shared by the batch
    * t_source_filter (stats = one groupBy over the corpus) and the
    * streamed s56 twin (stats = the converged native streaming
    * aggregation state): 1-row corpus-total broadcast, keep-decision
    * cross-multiplied on integers. */
  private[queries] def sourceFilterFrom(per: DataFrame): DataFrame = {
    val tot = per.agg(sum(col("q_sum")).as("t_sum"),
      sum(col("n_docs")).as("t_n"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("q_sum"),
        col("sum_ids"),
        floor(col("q_sum") / col("n_docs") + lit(0.5))
          .as("mean_q_micro"),
        (col("q_sum") * col("t_n") >= col("t_sum") * col("n_docs"))
          .cast("int").as("kept"))
      .orderBy(col("source"))
  }

  /** Shared with StreamingOps (s56): the streamed per-source stats
    * must reproduce exactly this batch reputation decision. */
  private[queries] val sourceFilterOracleSql: String =
    s"""WITH q AS (SELECT source, doc_id,
      |    CAST(floor((0.5 * (len(list_distinct($tokSql))::DOUBLE
      |      / len($tokSql)::DOUBLE)
      |      + 0.5 * least(1.0, length(text)::DOUBLE / 200.0))
      |      * 1000000 + 0.5) AS BIGINT) AS qmicro
      |  FROM documents),
      |per AS (SELECT source, count(*) AS n_docs,
      |    CAST(sum(qmicro) AS BIGINT) AS q_sum,
      |    CAST(sum(doc_id) AS BIGINT) AS sum_ids
      |  FROM q GROUP BY 1),
      |tot AS (SELECT CAST(sum(q_sum) AS BIGINT) AS t_sum,
      |    CAST(sum(n_docs) AS BIGINT) AS t_n FROM per)
      |SELECT source, n_docs, q_sum, sum_ids,
      |  CAST(floor(q_sum / n_docs + 0.5) AS BIGINT) AS mean_q_micro,
      |  CAST(q_sum * tot.t_n >= tot.t_sum * n_docs AS INTEGER) AS kept
      |FROM per, tot ORDER BY source""".stripMargin
}
