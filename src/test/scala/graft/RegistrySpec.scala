package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

import graft.queries.Registry

/** Contract checks on the driver-facing query registry. */
class RegistrySpec extends SparkTestBase {

  // overridable so the suite is not coupled to this machine's layout
  private val sfDir = sys.props.getOrElse("graft.testdata.dir",
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001"))

  // One pass over every entry checking two contracts at once:
  // (1) the driver's correctness comparator sorts result rows with
  // pandas and crashes on array/map/struct cells (CORRECTNESS_r01: 4
  // queries err'd with "unhashable type: 'numpy.ndarray'") — every
  // query must project nested types to scalars in its final SELECT;
  // (2) no physical plan may contain a CartesianProduct, and
  // BroadcastNestedLoopJoin is allowed only where a tiny broadcast side
  // makes it the right plan (ann_topk_bruteforce: 20 query vectors vs
  // the corpus — the documented exactness baseline; the scale path is
  // the bucketed ann_lsh_topk. ann_ivf_topk and v_kmeans_assign /
  // v_kmeans_lloyd3: the 16-row centroid table cross-scored against
  // the corpus — the broadcast side is the fixed cell count, never the
  // data. t_tfidf_top: the corpus row-count joined in as a broadcast
  // SINGLE row for the idf factor).
  test("query outputs are scalar-only and plans are free of cartesian blowups") {
    val bnljAllowed = Set("ann_topk_bruteforce", "ann_ivf_topk",
      "ann_recall", "v_kmeans_assign", "v_kmeans_lloyd3", "t_tfidf_top",
      "dedup_semantic", "pipe_curation", // 16-row centroid broadcast
      "t_unigram_lm", // 1-row corpus-total broadcast
      // int8 twins of the brute-force exactness baseline: the same
      // 20-query-vector broadcast panel against the corpus
      "ann_quantized_topk", "ann_quantized_recall", "ann_rp_recall",
      // 1-bit twins of the same panel-broadcast shape: 20 packed
      // 8-byte sign codes broadcast against the corpus codes
      "ann_hamming_topk", "ann_hamming_recall",
      // per-scene media vectors: the broadcast side is the ≤8-item
      // scene panel (docs 0–1), the corpus side per-scene vectors
      "ann_video_topk", "s58_stream_video_serving",
      // video × IVF composition + its recall row: the 16-row scene-
      // vector centroid broadcast (ivf) and the ≤8-item scene panel
      // BNLJ (the recall row's exact side)
      "ann_video_ivf_topk", "ann_video_ivf_recall",
      // the two-stage rung: the same panel BNLJ generates the binary
      // shortlist; the int8 rerank itself is id-keyed equi-joins
      "ann_hamming_rerank_topk", "ann_hamming_rerank_recall",
      // IVF×binary composition: candidate gen reuses the 16-row
      // centroid broadcast; Hamming scoring is id-keyed equi-joins
      "ann_ivf_hamming_topk",
      // IVF+SQ8 composition: candidate gen reuses the 16-row centroid
      // broadcast; scoring itself is id-keyed equi-joins
      "ann_ivf_quantized_topk",
      // trained-IVF rung + its recall row: the Lloyd rounds and the
      // probe chain are the same ≤16-row centroid broadcasts as
      // v_kmeans_lloyd3 / ann_ivf_topk; the recall row adds the
      // 20-query exact-panel BNLJ (ann_recall's shape)
      "ann_ivf_trained_topk", "ann_ivf_trained_recall",
      // 3-row threshold panel + two 1-row corpus aggregates broadcast
      // against the slim pair stream
      "dedup_lsh_prune_ratio",
      // three 1-row aggregates crossed (train sketch × test sketch ×
      // exact-intersection count) — every BNLJ side is a single row
      "t_kmv_contamination",
      // its streaming twin: the converged 1-row train × 1-row test
      // sketches crossed at the end of the replay
      "s39_stream_kmv_contamination",
      // PQ rung: the 8-row subspace fan-out + 128-row codebook +
      // per-query distance table are all fixed-size broadcasts (m, k
      // and the query panel — never data); ann_pq_recall additionally
      // carries the 20-query exact grid-L2 ground-truth BNLJ
      "ann_pq_topk", "ann_pq_recall", "ann_ivf_pq_topk",
      "ann_pq_trained_topk", "ann_pq_trained_recall",
      // media-feature twin of the brute-force exactness baseline: the
      // 8-query pooled-feature panel broadcast against the corpus
      "ann_media_topk",
      // media × IVF composition: the identical 16-row centroid
      // broadcast the embeddings IVF rung runs (it IS the same code)
      "ann_media_ivf_topk",
      // its recall row: the exact side is ann_media_topk's 8-query
      // panel BNLJ, the approx side the 16-row centroid broadcast —
      // both already-justified shapes folded into one measurement
      "ann_media_ivf_recall",
      // hard-negative mining: the same 20-query panel broadcast, with
      // the label-mismatch predicate fused into the candidate join
      "v_hard_negatives",
      // audio twin of ann_media_topk: the 8-clip pooled-feature panel
      // broadcast against the corpus
      "ann_audio_topk",
      // audio × IVF composition + its recall row: the same
      // already-justified shapes as the media lane — the 16-row
      // centroid broadcast (ivf) and the 8-clip panel BNLJ (the
      // recall row's exact side)
      "ann_audio_ivf_topk", "ann_audio_ivf_recall",
      // the 1-row capacity scalar crossed into the ≤5-row quota
      // table; the corpus itself joins the quota on lang equi-keys
      "t_domain_mix",
      // same 1-row capacity × ≤5-row quota cross inside the compose;
      // the corpus joins on lang/doc_id equi-keys only
      "pipe_training_mix",
      // power iteration + its application: every cross is a 1-row y /
      // 64-row M broadcast — the corpus is touched once, in the
      // moment-matrix equi-join, never by a BNLJ
      "v_pca_power3", "v_pca_remove_top",
      // t_unigram_lm's 1-row corpus-total broadcast, reused by the
      // banding pass (the band stats themselves join on lang equi-keys)
      "t_perplexity_filter",
      // t_domain_mix's 1-row capacity × ≤5-row quota cross with the
      // sqrt-temperature weights; corpus joins the quota on lang only
      "t_domain_mix_temp",
      // the 1-row corpus-total broadcast crossed into the ≤20-row
      // per-source stat table (the corpus itself never meets a BNLJ)
      "t_source_filter")
    val offenders = Registry.all.flatMap { e =>
      val df = e.fn(spark, sfDir)
      val nested = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => f.name
      }
      val plan = df.queryExecution.executedPlan.toString
      val planBad =
        (if (plan.contains("CartesianProduct")) Seq("CartesianProduct") else Nil) ++
        (if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(e.name))
          Seq("BroadcastNestedLoopJoin") else Nil)
      val bad = nested ++ planBad
      if (bad.isEmpty) None else Some(s"${e.name}: ${bad.mkString(",")}")
    }
    assert(offenders.isEmpty,
      s"driver-breaking schemas or cartesian plans: $offenders")
  }

  // The ANN serving tails rank through the mergeable TopKPairsAgg so
  // the k-trim runs BEFORE any scored row shuffles (the row_number
  // window they replaced shipped every scored candidate to one
  // reducer per query). This pins the plan shape on real registry
  // queries: a PARTIAL top-k aggregate must appear below the
  // exchange. One representative per scoring lane: int8 (quantized),
  // 1-bit (hamming), float (bruteforce).
  // One representative per scoring lane: int8 (quantized), 1-bit
  // (hamming), float (bruteforce), and the IVF lane whose PROBE
  // selection also ranks through the aggregate. Anchored on the
  // SHUFFLE exchange specifically ("Exchange hashpartitioning") — a
  // bare indexOf("Exchange") can hit a BroadcastExchange first and
  // the assertion degrades to "partial agg appears after some
  // exchange".
  test("ANN serving tails reduce top-k map-side (partial agg below " +
    "the exchange)") {
    for (name <- Seq("ann_quantized_topk", "ann_hamming_topk",
        "ann_topk_bruteforce", "ann_ivf_topk")) {
      val e = Registry.all.find(_.name == name).get
      val plan = e.fn(spark, sfDir).queryExecution.executedPlan.toString
      val exch = plan.indexOf("Exchange hashpartitioning")
      assert(exch >= 0, s"$name: no shuffle exchange in plan:\n$plan")
      assert(plan.substring(exch).contains("partial_graft_topk_pairs"),
        s"$name: no partial top-k aggregate below the exchange:\n$plan")
    }
  }

  // The driver's hasher is TYPE-sensitive: DuckDB's sum(INTEGER/BIGINT)
  // returns HUGEINT where Spark emits BIGINT, so a value-identical
  // result still hashes red. This class has cost three red rows across
  // rounds (r4 ×2, r6 ×1: q12_late_by_status); the fix is always
  // CAST(sum(...) AS BIGINT) in the oracle SQL. This static guard flags
  // any sum over an integer-typed argument that is not wrapped in a
  // CAST. (tools/check.py carries the exact twin of this check: it
  // DESCRIBEs every oracle in DuckDB and fails on HUGEINT output
  // columns — this spec is the fast in-sbt approximation.)
  test("no oracle contains an un-cast integer sum (DuckDB HUGEINT trap)") {
    // columns whose DuckDB type is DOUBLE/FLOAT in the testdata layout —
    // sums over these stay DOUBLE and are safe
    val floatCols = Set("c_acctbal", "s_acctbal", "p_retailprice",
      "o_totalprice", "l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "value")
    // sums whose HUGEINT provably never reaches the output schema:
    //   q_session_window / s12 / s15: sum(new_s) OVER ... builds the
    //   session id `sid`, consumed only by GROUP BY — never projected;
    //   dedup_simhash: the 32 per-bit sign-sums feed only
    //   `CASE WHEN sN > 0` comparisons, packed into an explicit BIGINT;
    //   m_video_scene_cut: sum(diff) OVER builds the per-doc running
    //   mean consumed only by a comparison (cut decision), never
    //   projected;
    //   ann_video_topk (and the IVF composition + recall over the
    //   same scene CTEs): sum(diff) OVER is the same comparison-only
    //   bar, and sum(is_cut) OVER (the scene id) reaches the output
    //   only through CAST(doc_id*4 + scene AS BIGINT)
    val exempt = Set("q_session_window", "s12_stream_session_window",
      "s15_stream_session_append", "dedup_simhash", "m_video_scene_cut",
      "ann_video_topk", "s58_stream_video_serving",
      "ann_video_ivf_topk", "ann_video_ivf_recall",
      "s68_stream_video_ivf")
    def floatish(arg: String): Boolean = {
      val a = arg.toLowerCase.replaceAll("'[^']*'", "''")
      floatCols.exists(c => s"(?s).*\\b$c\\b.*".r.matches(a)) ||
        "(?s).*\\d+\\.\\d+.*".r.matches(a) || a.contains("/") ||
        a.contains("round(") || a.contains("avg(") ||
        a.contains("::double") || a.contains("as double") ||
        a.contains("::float") || a.contains("as float")
    }
    // Balanced-paren extent [open, close) of every CAST(...) call in s:
    // a sum anywhere INSIDE such an extent takes the cast's target type
    // in the output, so HUGEINT can never surface from it. This
    // replaces the old "CAST( immediately before sum(" prefix check,
    // which missed e.g. CAST(COALESCE(sum(..), 0) AS BIGINT) — the r13
    // false positive on the Hamming-family sign CTEs.
    def castExtents(s: String): Seq[(Int, Int)] =
      "(^|[^a-z0-9_])cast\\s*\\(".r.findAllMatchIn(s).map { m =>
        val open = s.indexOf('(', m.start)
        var depth = 0; var j = open; var close = -1
        while (j < s.length && close < 0) {
          if (s(j) == '(') depth += 1
          else if (s(j) == ')') { depth -= 1; if (depth == 0) close = j }
          j += 1
        }
        (open, if (close < 0) s.length else close)
      }.toSeq
    val offenders = Registry.all.filterNot(e => exempt(e.name)).flatMap { e =>
      e.oracle.toSeq.flatMap { sql =>
        val s = sql.toLowerCase
        val casts = castExtents(s)
        Iterator.unfold(0) { from =>
          val i = s.indexOf("sum(", from)
          if (i < 0) None else Some((i, i + 4))
        }.filter(i => i == 0 || !s(i - 1).isLetterOrDigit)
          .flatMap { i =>
            // balanced-paren extraction of the sum argument
            var depth = 0; var j = i + 3
            do { if (s(j) == '(') depth += 1
                 else if (s(j) == ')') depth -= 1
                 j += 1 } while (depth > 0 && j < s.length)
            val arg = s.substring(i + 4, j - 1)
            // wrapped = the sum lies inside SOME cast(...) extent, at
            // any nesting depth (CAST(COALESCE(sum(..),0) AS BIGINT)
            // counts); the castExtents regex requires a non-identifier
            // char before 'cast' so 'broadcast(' is never mistaken
            val wrapped = casts.exists { case (o, c) => o < i && j <= c }
            if (!floatish(arg) && !wrapped)
              Some(s"${e.name}: sum(${arg.take(60)}…)")
            else None
          }.toSeq
      }
    }
    assert(offenders.isEmpty,
      s"oracle sums that will emit DuckDB HUGEINT — wrap in " +
        s"CAST(... AS BIGINT): $offenders")
  }

  // mirrorCanonicalSql prepends CTEs named documents/embeddings/events
  // to every dumped oracle, so those names are RESERVED: an oracle
  // defining its own CTE with one of them would hand DuckDB a
  // duplicate-CTE statement. The splice now rejects such oracles with
  // a loud require(); this runs every registered oracle through it so
  // a future collision fails in sbt, not in the driver's dump.
  test("every oracle survives the canonical-cast CTE splice (reserved names)") {
    Registry.all.foreach { e =>
      e.oracle.foreach { sql =>
        val mirrored = Registry.mirrorCanonicalSql(sql, "/dev/null")
        assert(mirrored.contains("documents AS (SELECT"),
          s"${e.name}: splice did not inject the canonical CTEs")
      }
    }
    // and the guard itself fires on a clashing oracle
    val clash = intercept[IllegalArgumentException] {
      Registry.mirrorCanonicalSql(
        "WITH events AS (SELECT 1 AS x) SELECT * FROM events", "/dev/null")
    }
    assert(clash.getMessage.contains("reserve"))
  }

  test("every query has a DuckDB oracle (or is explicitly exempt)") {
    val exempt = Set.empty[String] // rows-only checks allowed, but list them
    val missing = Registry.all.filter(e => e.oracle.isEmpty &&
      !exempt.contains(e.name)).map(_.name)
    assert(missing.isEmpty, s"queries without an oracle: $missing")
  }

  // Driver-artifact reconciliation guard: CORRECTNESS_r08 silently
  // dropped 48 queries (the driver's Verify swallows a query's
  // exception and emits NO row for it) and the gap sat unnoticed for
  // two rounds. Diff the declared registry against the newest committed
  // CORRECTNESS_r*.json: every query absent from the artifact must at
  // least run clean locally — absence is legitimate only for queries
  // added after that artifact was produced, and those must work; a
  // query that is both absent AND failing is exactly the silent-omission
  // failure mode this guard exists to catch.
  test("queries absent from the newest CORRECTNESS artifact run clean locally") {
    val root = java.nio.file.Paths.get(".")
    val artifacts = java.nio.file.Files.list(root).iterator()
    val rx = "CORRECTNESS_r(\\d+)\\.json".r
    var newest: Option[(Int, java.nio.file.Path)] = None
    try artifacts.forEachRemaining { p =>
      p.getFileName.toString match {
        case rx(n) if newest.forall(_._1 < n.toInt) =>
          newest = Some((n.toInt, p))
        case _ => ()
      }
    } finally ()
    assume(newest.nonEmpty, "no CORRECTNESS_r*.json artifact found")
    val (round, path) = newest.get
    val txt = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    // artifact keys are the only names followed by an object value
    val present = "\"([A-Za-z0-9_]+)\"\\s*:\\s*\\{".r
      .findAllMatchIn(txt).map(_.group(1)).toSet
    val absent = Registry.all.filterNot(e => present(e.name))
    info(s"CORRECTNESS_r$round: ${present.size} rows; " +
      s"${absent.size} registered queries absent: ${absent.map(_.name).mkString(", ")}")
    val broken = absent.flatMap { e =>
      try { e.fn(spark, sfDir).count(); None }
      catch { case ex: Exception =>
        Some(s"${e.name}: ${ex.getClass.getSimpleName} ${ex.getMessage.take(120)}")
      }
    }
    assert(broken.isEmpty,
      s"queries silently absent from CORRECTNESS_r$round AND failing locally " +
        s"— the driver will drop their rows again: $broken")
  }

  // Catalyst-inlining guard for the rolling-hash pitfall class: the
  // O(n) hash array MUST be materialized once as a projected attribute
  // and consumed by reference. Routing it through a single-use alias
  // lets CollapseProject inline it into the consuming Generate and
  // InferFiltersFromGenerate's pre-filter — the whole array is then
  // re-derived per element (O(n²)). This has bitten twice (32 s
  // pre-RollingHashExpr; the r10 withCdcChunks refactor, 1.24 s →
  // 19.7 s at sf0.1). Two assertions per rolling-hash consumer:
  // (1) graft_rolling_hash appears EXACTLY ONCE in the optimized plan
  // (the inlined shape plants a second copy in the inferred filter);
  // (2) it never sits INSIDE a higher-order-function lambda body (the
  // per-element-evaluation shape, even when textually single).
  test("rolling-hash stages materialize the hash array exactly once") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.catalyst.expressions.LambdaFunction
    import graft.functions.RollingHashExpr
    def audit(df: DataFrame): (Int, Int) = {
      var total = 0; var inLambda = 0
      df.queryExecution.optimizedPlan.foreach { node =>
        node.expressions.foreach(_.foreach {
          case _: RollingHashExpr => total += 1
          case lf: LambdaFunction => lf.foreach {
            case _: RollingHashExpr => inLambda += 1
            case _ => ()
          }
          case _ => ()
        })
      }
      (total, inLambda)
    }
    def entryDf(name: String): DataFrame =
      Registry.all.find(_.name == name)
        .getOrElse(fail(s"registry entry $name missing")).fn(spark, sfDir)
    val targets: Seq[(String, DataFrame)] = Seq(
      "m_chunk_cdc" -> entryDf("m_chunk_cdc"),
      "t_winnow_fingerprint" -> entryDf("t_winnow_fingerprint"),
      // s37's scan-local stage, built batch-side over the real scan
      // (a literal df would be constant-folded away)
      "s37_cdc_scan_stage" -> graft.queries.StreamDedupTwins.cdcChunkCountRows(
        Registry.table(spark, sfDir, "documents")
          .select(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("text"))))
    val bad = targets.flatMap { case (nm, df) =>
      val (total, inLambda) = audit(df)
      if (total == 1 && inLambda == 0) None
      else Some(s"$nm: graft_rolling_hash ×$total ($inLambda inside lambdas)")
    }
    assert(bad.isEmpty,
      s"rolling-hash array inlined into its consumer (O(n²) plan): $bad")
  }

  // Docs-in-lockstep guard: COVERAGE.md is the judge-facing inventory
  // and has gone stale on every round that added queries without a
  // matching doc edit. Every registered query name must appear there
  // verbatim (TPC-H q{N}_* rows are grouped under family lines, so
  // the names themselves are listed in its tables).
  test("every registered query is documented in COVERAGE.md") {
    val covPath = java.nio.file.Paths.get("COVERAGE.md")
    assume(java.nio.file.Files.exists(covPath), "COVERAGE.md not found")
    val cov = new String(java.nio.file.Files.readAllBytes(covPath), "UTF-8")
    val undocumented = Registry.all.map(_.name).filterNot(cov.contains)
    assert(undocumented.isEmpty,
      s"queries missing from COVERAGE.md: $undocumented")
  }
}
