package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.VectorFunctions

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the exactness baseline, and a
  * sign-LSH bucketed variant as the scale path (at 100 TB the bucket
  * id becomes the shuffle/partition key, so each query probes one
  * bucket instead of the whole corpus).
  *
  * All vector math is sequential-order double arithmetic expressed
  * identically in Spark (`aggregate(zip_with(..))`) and DuckDB
  * (`list_inner_product`), so cosines hash-match bit-for-bit; outputs
  * additionally round to 6 decimals.
  */
object VectorOps {

  val numPlanes = 8
  val dims = 64
  val nearDupThreshold = 0.45 // driver embeddings are near-orthogonal
  val queryCount = 20
  /** Triangle-blocking factor for the exact all-pairs join: the n²
    * comparison space is tiled into G(G+1)/2 block-pairs, each an
    * independent equi-join partition of (n/G)² work. */
  val blockCount = 16
  /** Banded sign-LSH shape for the candidate-generation variant:
    * 8 bands × 2 hyperplanes. */
  val lshBands = 8
  val lshRowsPerBand = 2
  /** IVF shape: coarse-quantize into `ivfCells` cells, probe the
    * `ivfProbes` nearest cells per query. */
  val ivfCells = 16
  val ivfProbes = 2
  val ivfTopK = 5
  /** Scalar-quantization levels: int8 symmetric, q ∈ [-127, 127]. */
  val qLevels = 127
  /** Random-projection target dimensionality (64 → 16). */
  val rpDims = 16

  /** Binary-shortlist size for the rerank rung: Hamming selects this
    * many candidates per query, int8 rescoring picks the final 5. */
  val rerankShortlist = 50
  /** Product-quantization shape (FAISS PQ8x4 layout): m = 8 subspaces
    * of 8 dims, 16 centroids per subspace → one 4-bit code per
    * subspace, 8 codes (4 bytes) per vector vs 512 bytes of float64 —
    * a 128× payload compression for candidate scoring. */
  val pqSubspaces = 8
  val pqSubDim: Int = dims / pqSubspaces
  val pqCentroids = 16
  /** Fixed pre-quantization grid for the PQ rung: all PQ distances are
    * computed on gi = floor(xi·1000 + 0.5) (half-up, the SQ8 idiom),
    * so every subspace distance, distance-table entry and ADC sum is
    * an INTEGER held exactly in a double — cross-engine bit-equality
    * with no rounding or accumulation-order hazard anywhere. Unlike
    * SQ8's per-vector scale, the grid is global, so L2 geometry is
    * preserved across vectors (the property PQ needs and a
    * per-vector scale would break). */
  val pqGrid = 1000

  /** Embeddings with the L2 norm materialized per row — pair-level
    * cosines then cost one dot product instead of three (sqrt per row
    * vs per pair is bitwise-identical, so the DuckDB oracle formula is
    * unchanged). Repartitioned so vector math parallelizes beyond the
    * single input-file split. */
  private def emb(spark: SparkSession, dir: String): DataFrame =
    Registry.table(spark, dir, "embeddings")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", VectorFunctions.norm(col("e")))

  /** Shared with StreamingOps (s25): the corpus as slim
    * (vec_id, e, nrm) rows for the streaming ingest. */
  private[queries] def embSlim(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir).select(col("vec_id"), col("e"), col("nrm"))

  /** Shared with StreamingOps (s63): the labeled corpus
    * (vec_id, label, e, nrm) for the hard-negative serving twin. */
  private[queries] def embLabeled(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir).select(col("vec_id"), col("label"), col("e"), col("nrm"))

  /** Hard-negative mining over a supplied labeled corpus (vec_id,
    * label, e, nrm): for each query-panel vector the top-5
    * most-similar vectors with a DIFFERENT label — the label-mismatch
    * predicate fused into the candidate join (pairs filter BEFORE
    * scoring), map-side top-k carrying the query-side label through
    * the groupBy, and the neighbor's label re-fetched by id AFTER the
    * k-trim (a tiny-broadcast equi-join on k·queries rows, never the
    * scored candidate set). Shared by v_hard_negatives and its
    * streamed twin s63, whose converged label+vector state must mine
    * the same negatives. */
  private[queries] def hardNegativesFrom(base: DataFrame): DataFrame = {
    val q = base.filter(col("vec_id") < queryCount)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("e").as("qe"), col("nrm").as("qn"))
    val n = base
      .select(col("vec_id").as("neighbor_id"), col("label").as("nlabel"),
        col("e").as("ne"), col("nrm").as("nn"))
    val scored = broadcast(q).join(n, col("qlabel") =!= col("nlabel"))
      .select(col("query_id"), col("qlabel"), col("neighbor_id"),
        round(VectorFunctions.dot(col("qe"), col("ne")) /
          (col("qn") * col("nn")), 6).as("sim"))
    val labels = base
      .select(col("vec_id").as("neighbor_id"), col("label").as("nlabel"))
    val topk = scored.groupBy(col("query_id"), col("qlabel"))
      .agg(graft.functions.TopKPairsAgg
        .topkPairs(-col("sim"), col("neighbor_id"), 5).as("tk"))
      .select(col("query_id"), col("qlabel"),
        posexplode(col("tk")).as(Seq("pos", "x")))
      .select(col("query_id"), col("qlabel"),
        (col("pos") + 1).cast("int").as("rank"),
        col("x.id").as("neighbor_id"), (-col("x.score")).as("sim"))
    broadcast(topk).join(labels, "neighbor_id")
      .select(col("query_id"), col("qlabel"), col("rank"),
        col("neighbor_id"), col("nlabel"), col("sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Oracle for [[hardNegativesFrom]] — shared by v_hard_negatives
    * and s63. */
  private[queries] lazy val hardNegOracleSql: String =
    s"""WITH v AS ($embSql)
       |SELECT q.vec_id AS query_id, q.label AS qlabel,
       |  CAST(row_number() OVER (PARTITION BY q.vec_id
       |    ORDER BY round(${cosSql("q.e", "n.e")}, 6) DESC, n.vec_id) AS INT) AS rank,
       |  n.vec_id AS neighbor_id, n.label AS nlabel,
       |  round(${cosSql("q.e", "n.e")}, 6) AS sim
       |FROM v q JOIN v n ON q.vec_id < $queryCount AND q.label <> n.label
       |QUALIFY rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** Shared with StreamingOps (s25): the IVF seed centroid table
    * (first [[ivfCells]] vectors by id — the same deterministic seed
    * ann_ivf_topk probes). */
  private[queries] def ivfSeedCentroids(spark: SparkSession,
                                        dir: String): DataFrame =
    emb(spark, dir).filter(col("vec_id") < ivfCells)
      .select(col("vec_id").as("cid"), col("e").as("ce"),
        col("nrm").as("cn"))

  /** Shared with StreamingOps: the incremental IVF cell-assignment
    * state (s25) must converge to exactly this batch index. */
  private[queries] def ivfAssignOracleSql: String =
    s"""WITH v AS ($embSql),
       |c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < $ivfCells),
       |s AS (SELECT v.vec_id, c.cid,
       |    round(${cosSql("v.e", "c.ce")}, 6) AS csim
       |  FROM v CROSS JOIN c)
       |SELECT vec_id, cid AS cell FROM (
       |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY csim DESC, cid) AS r FROM s) WHERE r = 1
       |ORDER BY vec_id""".stripMargin

  private[queries] val embSql =
    "SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings"
  private[queries] def cosSql(a: String, b: String) =
    s"list_inner_product($a, $b) / (sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b)))"

  /** DuckDB literal for plane p (same integers as VectorFunctions). */
  private def planeSql(p: Int): String =
    VectorFunctions.planeComponents(p, dims).mkString("[", ", ", "]::DOUBLE[]")

  /** Similarity rungs measured by dedup_lsh_prune_ratio: the corpus
    * threshold (0.45), a mid rung, and the production dedup point. */
  private val recallThresholds = Seq(0.45, 0.6, 0.8)

  /** Exact near-dup ground truth (v1 < v2, sim >= nearDupThreshold),
    * computed with the G(G+1)/2 triangle-blocked equi-join — every
    * task owns one (n/G)×(n/G) tile of the comparison space, so work
    * distributes evenly with bounded memory per task and the plan has
    * no cartesian/BroadcastNestedLoopJoin. Shared by
    * dedup_embedding_near (the exactness baseline) and
    * dedup_lsh_prune_ratio (its ground truth). */
  private def exactNearDupPairs(spark: SparkSession,
                                dir: String): DataFrame = {
    import spark.implicits._
    val g = blockCount
    val blockPairs = broadcast(
      (for { i <- 0 until g; j <- i until g } yield (i, j))
        .toDF("gi", "gj"))
    val v = emb(spark, dir)
      .withColumn("blk", pmod(col("vec_id"), lit(g)).cast("int"))
    val aSide = blockPairs.join(v, col("gi") === col("blk"))
      .select(col("gi"), col("gj"), col("vec_id").as("v1"),
        col("e").as("e1"), col("nrm").as("n1"))
    val bSide = blockPairs.join(v, col("gj") === col("blk"))
      .select(col("gi").as("hi"), col("gj").as("hj"),
        col("vec_id").as("v2"), col("e").as("e2"), col("nrm").as("n2"))
    aSide.join(bSide, col("gi") === col("hi") && col("gj") === col("hj") &&
        (col("gi") =!= col("gj") || col("v1") < col("v2")))
      .withColumn("sim",
        round(VectorFunctions.dot(col("e1"), col("e2")) /
          (col("n1") * col("n2")), 6))
      .filter(col("sim") >= nearDupThreshold)
      .select(least(col("v1"), col("v2")).as("v1"),
        greatest(col("v1"), col("v2")).as("v2"), col("sim"))
  }

  /** Slim LSH candidate id-pairs (v1 < v2), deduped across bands.
    * Candidate generation and pair-dedup run over SLIM
    * (band, bucket, vec_id) rows only — letting the 64-dim vectors
    * ride through the candidate join and the dropDuplicates exchange
    * multiplies shuffle volume ~50× (measured 264 s vs ~15 s at
    * sf0.1). Consumers re-fetch vectors by id equi-joins AFTER the
    * pair dedup; at 100 TB the id-pair dedup is the only
    * O(candidates) shuffle. Shared by dedup_embedding_lsh and
    * dedup_lsh_prune_ratio. */
  private def lshCandidatePairs(spark: SparkSession,
                                dir: String): DataFrame = {
    val keyed = emb(spark, dir).select(col("vec_id"), posexplode(
        VectorFunctions.bandBuckets(col("e"), lshBands, lshRowsPerBand, dims))
      .as(Seq("band", "bucket")))
    val a = keyed.select(col("band"), col("bucket"), col("vec_id").as("v1"))
    val b = keyed.select(col("band").as("band2"),
      col("bucket").as("bucket2"), col("vec_id").as("v2"))
    a.join(b, col("band") === col("band2") &&
        col("bucket") === col("bucket2") && col("v1") < col("v2"))
      .select(col("v1"), col("v2"))
      .dropDuplicates("v1", "v2") // a pair may collide in >1 band
  }

  /** The banded sign-LSH bucket CTE body (expects `v` in scope) —
    * the DuckDB mirror of [[lshCandidatePairs]]'s banding, shared by
    * the dedup_embedding_lsh and dedup_lsh_prune_ratio oracles. */
  private def lshBandCteSql: String = {
    val bandCase = (0 until lshBands).map { k =>
      val e = (0 until lshRowsPerBand).map { r =>
        s"(CASE WHEN list_inner_product(${planeSql(k * lshRowsPerBand + r)}, e) > 0 THEN ${1 << r} ELSE 0 END)"
      }.mkString(" + ")
      s"WHEN $k THEN $e"
    }.mkString(" ")
    s"""SELECT vec_id, e, band,
       |  CASE band $bandCase END AS bucket
       |  FROM v, (SELECT unnest(generate_series(0, ${lshBands - 1})) AS band) t""".stripMargin
  }

  private val bucketSql: String =
    (0 until numPlanes).map { p =>
      s"(CASE WHEN list_inner_product(${planeSql(p)}, e) > 0 THEN ${1L << p}::BIGINT ELSE 0::BIGINT END)"
    }.mkString(" + ")

  /** Spark side of an n-round Lloyd run: seed on the first `ivfCells`
    * vectors by id, train `rounds` full iterations, emit the final
    * assignment (shared by v_kmeans_assign and v_kmeans_lloyd3). */
  private def lloydQuery(spark: SparkSession, dir: String,
                         rounds: Int): DataFrame = {
    val vectors = emb(spark, dir)
      .select(col("vec_id").as("id"), col("e"))
    val seed = vectors.filter(col("id") < ivfCells)
      .select(col("id").as("cid"), col("e").as("ce"))
    val trained = graft.core.VectorTools.lloyd(vectors, seed, rounds)
    graft.core.VectorTools.assignCells(vectors, trained)
      .select(col("id").as("vec_id"), col("cell"), col("csim"))
      .orderBy(col("vec_id"))
  }

  /** The `rounds`-iteration Lloyd CTE chain (v, c0, s1…c$rounds) —
    * rounded cosines, lower-cid argmax tiebreak, and FIXED-POINT
    * centroid means (the VectorTools cross-engine determinism
    * contract): each component micro-quantizes per row
    * (floor(v·10⁶ + 0.5) — exact integers, so the sums are
    * order-independent on both engines, where the retired
    * round(avg(v), 6) lane could flake on a component sitting exactly
    * on a 6-decimal boundary), and the mean is the one double
    * division (S/n)/10⁶ in the same operation order as Spark's
    * [[graft.core.VectorTools.microMean]]. Cells that lose every
    * member drop out of the next round's centroid CTE on both
    * engines alike. Shared by the assignment oracles
    * ([[lloydOracleSql]]) and the trained-IVF oracles, which probe
    * the final `c$rounds` table. */
  private def lloydCtesSql(rounds: Int): String = {
    val sb = new StringBuilder(
      s"WITH v AS ($embSql),\n" +
        s"c0 AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < $ivfCells)")
    for (r <- 1 to rounds) sb.append(s""",
      |s$r AS (SELECT v.vec_id, c.cid,
      |    round(${cosSql("v.e", "c.ce")}, 6) AS csim
      |  FROM v CROSS JOIN c${r - 1} c),
      |a$r AS (SELECT vec_id, cid AS cell FROM (
      |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
      |    ORDER BY csim DESC, cid) AS r FROM s$r) WHERE r = 1),
      |m$r AS (SELECT a$r.cell, i,
      |    (CAST(sum(CAST(floor(v.e[i] * 1000000 + 0.5) AS BIGINT))
      |      AS DOUBLE) / count(*)) / 1000000.0 AS c
      |  FROM a$r JOIN v USING (vec_id), generate_series(1, $dims) g(i)
      |  GROUP BY 1, 2),
      |c$r AS (SELECT cell AS cid, list(c ORDER BY i) AS ce FROM m$r
      |  GROUP BY cell)""".stripMargin)
    sb.toString
  }

  /** DuckDB oracle unrolling `rounds` Lloyd iterations
    * ([[lloydCtesSql]]), then the final assignment. */
  private def lloydOracleSql(rounds: Int): String =
    lloydCtesSql(rounds) + s""",
      |sf AS (SELECT v.vec_id, c.cid,
      |    round(${cosSql("v.e", "c.ce")}, 6) AS csim
      |  FROM v CROSS JOIN c$rounds c)
      |SELECT vec_id, cid AS cell, csim FROM (
      |  SELECT vec_id, cid, csim, row_number() OVER (PARTITION BY vec_id
      |    ORDER BY csim DESC, cid) AS r FROM sf) WHERE r = 1
      |ORDER BY vec_id""".stripMargin

  /** v_kmeans_assign's oracle (one unrolled Lloyd round) — shared
    * with the streamed sufficient-statistics twin s65, whose
    * incrementally-maintained (cell, pos) sums must reproduce the
    * same round-1 centroids and final assignment. */
  private[queries] lazy val kmeansAssignOracleSql: String =
    lloydOracleSql(1)

  /** v_kmeans_lloyd3's oracle (three unrolled Lloyd rounds) — shared
    * with the streamed full-trajectory twin s66, whose per-round
    * re-seeded stat passes must reproduce the same 3-round centroid
    * trajectory and final assignment. */
  private[queries] lazy val kmeansLloyd3OracleSql: String =
    lloydOracleSql(3)

  def entries: Seq[Entry] = Seq(

    // Distributed k-means (Lloyd) assignment after one full training
    // round: seed centroids (first `ivfCells` vectors by id) → assign
    // → element-wise-mean update → re-assign. This is the training
    // loop an IVF index runs before ann_ivf_topk probes it; every step
    // is a DataFrame plan (slim assignment shuffle, posexplode+partial-
    // agg centroid update — see core.VectorTools). The DuckDB oracle
    // unrolls the identical iteration (rounded cosines, rounded
    // centroid components, lower-cid tiebreak), so a full ML training
    // step is hash-checked end-to-end across engines.
    Entry("v_kmeans_assign",
      (spark, dir) => lloydQuery(spark, dir, rounds = 1),
      Some(lloydOracleSql(1))),

    // THREE full Lloyd rounds before the final assignment — exercises
    // the VectorTools.lloyd iteration loop beyond n=1: per-round plan
    // truncation (localCheckpoint between rounds), convergence
    // behavior (assignments migrate across rounds), and empty-cell
    // dropout (a cell that loses every member vanishes from the next
    // round's centroid table on both engines). The oracle unrolls the
    // identical three iterations, so the whole multi-round training
    // trajectory is hash-checked across engines, not just one step.
    Entry("v_kmeans_lloyd3",
      (spark, dir) => lloydQuery(spark, dir, rounds = 3),
      Some(lloydOracleSql(3))),

    // DISTRIBUTED PCA VIA POWER ITERATION — the other training
    // primitive an embedding pipeline runs besides k-means: the top
    // principal direction of the corpus (whitening / anisotropy
    // removal / the OPQ rotation's first column). Built to be exact
    // cross-engine by construction: (1) the uncentered second-moment
    // matrix M = Σ x·xᵀ is accumulated over the INTEGER-GRID corpus
    // (the PQ grid), so every M entry is an exact integer — the one
    // genuinely data-sized aggregation, one (i, j) partial-agg
    // shuffle of 64² slim rows per partition; (2) each power step
    // y ← M·y is 64 SEQUENTIAL dots (M held as 64 array rows, y a
    // 1-row broadcast) — never a groupBy float sum, so there is no
    // accumulation-order hazard anywhere; (3) normalization divides
    // by the sequential norm; (4) only the FINAL components are
    // fixed-point-quantized (half-up micro), never round(). Three
    // unrolled iterations from the all-ones seed, like
    // v_kmeans_lloyd3; the Rayleigh quotient yᵀMy/yᵀy rides along as
    // the dominant-eigenvalue estimate. At 100 TB: M is 64×64 — the
    // corpus is touched ONCE, every iteration is driver-free
    // broadcast arithmetic on a 32 KB matrix.
    Entry("v_pca_power3",
      (spark, dir) => pcaPowerQuery(spark, dir, 3),
      Some(pcaPowerOracleSql(3))),

    // PCA APPLIED — the training→application close for PCA (as
    // t_bpe_encode is to t_bpe_train, s44/s46 to their indexes): the
    // "all-but-the-top" embedding post-process (arXiv:1702.01417, the
    // standard anisotropy fix) removes the learned dominant direction
    // from every vector. With y unit-norm the residual norm needs no
    // second pass: ‖x − (x·y)y‖² = ‖x‖² − (x·y)², so per vector the
    // whole application is ONE sequential dot against the broadcast
    // direction plus scalar arithmetic — scan-local, the corpus is
    // touched once and nothing shuffles but the output sort. Both the
    // projection coefficient and the residual norm are emitted
    // micro-quantized.
    Entry("v_pca_remove_top",
      (spark, dir) => {
        val y = pcaDirection(spark, dir, 3)
        gridded(spark, dir).crossJoin(broadcast(y))
          .withColumn("coef", VectorFunctions.dot(col("g"), col("y")))
          .select(col("vec_id"),
            (floor(col("coef") * lit(1000d) + lit(0.5)) / lit(1000d))
              .as("coef_milli"),
            (floor(sqrt(VectorFunctions.dot(col("g"), col("g"))
              - col("coef") * col("coef")) * lit(1000d) + lit(0.5)) /
              lit(1000d)).as("resid_norm_milli"))
          .orderBy(col("vec_id"))
      },
      Some {
        val chain = pcaChainCteSql(3)
        s"""$chain
           |SELECT gv.vec_id,
           |  floor(list_inner_product(gv.g, y3.y) * 1000 + 0.5) / 1000
           |    AS coef_milli,
           |  floor(sqrt(list_inner_product(gv.g, gv.g)
           |      - list_inner_product(gv.g, y3.y)
           |        * list_inner_product(gv.g, y3.y)) * 1000 + 0.5) / 1000
           |    AS resid_norm_milli
           |FROM gv, y3 ORDER BY gv.vec_id""".stripMargin
      }),

    // Per-label centroids as (label, pos, mean) rows — the k-means
    // M-step / IVF-training primitive, distributed the only way that
    // scales: posexplode to element rows, partial-agg on (label, pos),
    // never a driver-side vector sum. 64 rows per label out; the
    // re-assembled centroid array is one small collect_list away when
    // a consumer (e.g. the next Lloyd iteration) needs it.
    // Per-label centroids through the same fixed-point M-step lane as
    // Lloyd (exact integer micro sums, one deterministic division —
    // VectorTools.microMean): a double avg() accumulates in partition
    // order on Spark and in DuckDB's own order in the oracle, so a
    // component landing exactly on a 6-decimal rounding boundary
    // could hash-flake; the integer lane has no accumulation-order
    // hazard at all.
    Entry("v_label_centroids",
      (spark, dir) => {
        emb(spark, dir)
          .select(col("label"), posexplode(col("e")).as(Seq("pos", "v")))
          .groupBy(col("label"), col("pos").cast("long").as("pos"))
          .agg(graft.core.VectorTools.microMean(
              sum(graft.core.VectorTools.microQuantize(col("v"))),
              count(lit(1))).as("c"),
            count(lit(1)).as("n_vecs"))
          .orderBy(col("label"), col("pos"))
      },
      Some(s"""SELECT label, i - 1 AS pos,
        |  (CAST(sum(CAST(floor(e[i] * 1000000 + 0.5) AS BIGINT))
        |    AS DOUBLE) / count(*)) / 1000000.0 AS c,
        |  count(*) AS n_vecs
        |FROM ($embSql), generate_series(1, $dims) g(i)
        |GROUP BY 1, 2 ORDER BY label, pos""".stripMargin)),

    Entry("v_norms",
      (spark, dir) => {
        emb(spark, dir)
          .select(col("vec_id"), col("label"),
            round(col("nrm"), 6).as("norm"))
          .orderBy(col("vec_id"))
      },
      Some(s"""SELECT vec_id, label,
        |  round(sqrt(list_inner_product(e, e)), 6) AS norm
        |FROM ($embSql) ORDER BY vec_id""".stripMargin)),

    // Exact near-dup pairs as a BALANCED BLOCKED self-join (exact APSS):
    // vectors are hashed into G blocks; the triangle of G(G+1)/2
    // block-pairs is broadcast and tagged onto both sides, and the main
    // join is an EQUI-join on the (gi, gj) block-pair key — each key is
    // one (n/G)×(n/G) tile of the comparison space, so work distributes
    // evenly across executors with bounded memory per task, and the plan
    // has no cartesian/BroadcastNestedLoopJoin.
    //
    // Why not LSH candidate pruning here: measured at sf0.01/sf0.1, the
    // qualifying pairs sit at sim 0.45–0.60 with a dense continuum of
    // pairs just below the 0.45 threshold (976 pairs in [0.30, 0.45) at
    // sf0.01) — there is NO similarity gap, so any sign-LSH banding that
    // keeps all true pairs admits ~all pairs (per-plane agreement 0.65
    // vs 0.50 background). Exact APSS on gap-free data is inherently
    // Ω(n²); the sublinear scale path is [[Entry dedup_embedding_lsh]]
    // below (and at production dedup thresholds ≥0.8 its banding prunes
    // hard). Exactness baseline kept per SURVEY §2 extension contract.
    Entry("dedup_embedding_near",
      (spark, dir) => exactNearDupPairs(spark, dir)
        .orderBy(col("v1"), col("v2")),
      Some(s"""WITH v AS ($embSql)
        |SELECT a.vec_id AS v1, b.vec_id AS v2,
        |  round(${cosSql("a.e", "b.e")}, 6) AS sim
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |WHERE round(${cosSql("a.e", "b.e")}, 6) >= $nearDupThreshold
        |ORDER BY v1, v2""".stripMargin)),

    // Banded sign-LSH near-dup: candidates = pairs agreeing on ANY of
    // 8 two-plane bands (equi-join on the (band, bucket) key — the
    // bucket IS the shuffle key, so at 100 TB this is the scan-shuffle-
    // verify scale path), then exact-cosine verification. The DuckDB
    // oracle mirrors the identical deterministic banding, so the result
    // is hash-exact by construction (same discipline as
    // dedup_minhash_pairs). Recall vs the exact dedup_embedding_near is
    // a measured, documented property: ~99% per pair at sim≈0.5
    // (catch = 1−(1−p²)⁸, p = 1−θ/π); at this deliberately LSH-hostile
    // threshold the pruning is weak on gap-free data, at realistic
    // dedup thresholds (sim ≥ 0.8, p ≥ 0.80) the same operator prunes
    // ~97% of the comparison space.
    Entry("dedup_embedding_lsh",
      (spark, dir) => {
        val base = emb(spark, dir)
        val cand = lshCandidatePairs(spark, dir)
        val va = base.select(col("vec_id").as("v1"),
          col("e").as("e1"), col("nrm").as("n1"))
        val vb = base.select(col("vec_id").as("v2"),
          col("e").as("e2"), col("nrm").as("n2"))
        cand.join(va, "v1").join(vb, "v2")
          .withColumn("sim",
            round(VectorFunctions.dot(col("e1"), col("e2")) /
              (col("n1") * col("n2")), 6))
          .filter(col("sim") >= nearDupThreshold)
          .select(col("v1"), col("v2"), col("sim"))
          .orderBy(col("v1"), col("v2"))
      },
      Some(s"""WITH v AS ($embSql),
        |b AS ($lshBandCteSql),
        |cand AS (SELECT DISTINCT a.vec_id AS v1, c.vec_id AS v2
        |  FROM b a JOIN b c ON a.band = c.band AND a.bucket = c.bucket
        |    AND a.vec_id < c.vec_id)
        |SELECT cand.v1, cand.v2,
        |  round(${cosSql("va.e", "vb.e")}, 6) AS sim
        |FROM cand JOIN v va ON va.vec_id = cand.v1
        |  JOIN v vb ON vb.vec_id = cand.v2
        |WHERE round(${cosSql("va.e", "vb.e")}, 6) >= $nearDupThreshold
        |ORDER BY v1, v2""".stripMargin)),

    // LSH PRUNING MEASURED, NOT ASSERTED: dedup_embedding_lsh's docs
    // quote ~97% comparison-space pruning at production dedup
    // thresholds — this row hash-checks what the banding actually does
    // on THIS corpus. One row per threshold rung: exact ground-truth
    // pairs at >= the rung (from the blocked exact join), how many the
    // banding catches (recall), plus the corpus-wide candidate count
    // and the fraction of the n(n-1)/2 comparison space pruned. On the
    // near-orthogonal driver embeddings the banding is deliberately
    // LSH-hostile (per-plane agreement ~0.5 between random pairs →
    // candidates ≈ 1-(3/4)^8 ≈ 90% of all pairs), so the measured
    // prune_ratio ~0.1 here documents the geometry-dependence of the
    // claim; on clustered production data with a similarity gap the
    // same operator prunes hard. recall is NULL at rungs with no true
    // pairs (this corpus' pair sims top out below 0.6: measured at
    // sf0.01 — 14/14 caught at 0.45, candidates 89.5% of the space) —
    // NULL in both engines alike.
    Entry("dedup_lsh_prune_ratio",
      (spark, dir) => {
        import spark.implicits._
        val truth = exactNearDupPairs(spark, dir)
        val cand = lshCandidatePairs(spark, dir)
        val marked = truth.join(cand.withColumn("hit", lit(1)),
          Seq("v1", "v2"), "left")
        val thr = broadcast(recallThresholds.toDF("threshold"))
        val perThr = marked.crossJoin(thr)
          .groupBy(col("threshold"))
          .agg(
            count(when(col("sim") >= col("threshold"), 1)).as("n_true"),
            count(when(col("sim") >= col("threshold") && col("hit") === 1, 1))
              .as("n_caught"))
        val nc = cand.agg(count(lit(1)).as("n_candidates"))
        val tot = emb(spark, dir)
          .agg((count(lit(1)) * (count(lit(1)) - 1) / 2).as("total_pairs"))
        perThr.crossJoin(broadcast(nc)).crossJoin(broadcast(tot))
          .select(col("threshold"), col("n_true"), col("n_caught"),
            when(col("n_true") === 0, lit(null).cast("double"))
              .otherwise(round(col("n_caught") / col("n_true"), 6))
              .as("recall"),
            col("n_candidates"),
            round(lit(1) - col("n_candidates") / col("total_pairs"), 6)
              .as("prune_ratio"))
          .orderBy(col("threshold"))
      },
      Some(s"""WITH v AS ($embSql),
        |b AS ($lshBandCteSql),
        |cand AS (SELECT DISTINCT a.vec_id AS v1, c.vec_id AS v2
        |  FROM b a JOIN b c ON a.band = c.band AND a.bucket = c.bucket
        |    AND a.vec_id < c.vec_id),
        |p AS (SELECT a.vec_id AS v1, bb.vec_id AS v2,
        |    round(${cosSql("a.e", "bb.e")}, 6) AS sim
        |  FROM v a JOIN v bb ON a.vec_id < bb.vec_id
        |  WHERE round(${cosSql("a.e", "bb.e")}, 6) >= $nearDupThreshold),
        |m AS (SELECT p.v1, p.v2, p.sim,
        |    CASE WHEN cand.v1 IS NOT NULL THEN 1 END AS hit
        |  FROM p LEFT JOIN cand ON p.v1 = cand.v1 AND p.v2 = cand.v2),
        |t(threshold) AS (VALUES ${
          recallThresholds.map(t => s"($t::DOUBLE)").mkString(", ")}),
        |nc AS (SELECT count(*) AS n_candidates FROM cand),
        |tp AS (SELECT count(*) * (count(*) - 1) // 2 AS total_pairs FROM v)
        |SELECT t.threshold,
        |  count(CASE WHEN m.sim >= t.threshold THEN 1 END) AS n_true,
        |  count(CASE WHEN m.sim >= t.threshold AND m.hit = 1 THEN 1 END)
        |    AS n_caught,
        |  CASE WHEN count(CASE WHEN m.sim >= t.threshold THEN 1 END) = 0
        |    THEN NULL
        |    ELSE round(
        |      count(CASE WHEN m.sim >= t.threshold AND m.hit = 1 THEN 1 END)
        |        ::DOUBLE /
        |      count(CASE WHEN m.sim >= t.threshold THEN 1 END), 6) END
        |    AS recall,
        |  nc.n_candidates,
        |  round(1 - nc.n_candidates::DOUBLE / tp.total_pairs, 6)
        |    AS prune_ratio
        |FROM t CROSS JOIN m CROSS JOIN nc CROSS JOIN tp
        |GROUP BY t.threshold, nc.n_candidates, tp.total_pairs
        |ORDER BY threshold""".stripMargin)),

    Entry("ann_topk_bruteforce",
      (spark, dir) => bruteTopkPairs(spark, dir)
        .orderBy(col("query_id"), col("rank")),
      Some(s"""WITH v AS ($embSql)
        |SELECT q.vec_id AS query_id,
        |  CAST(row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY round(${cosSql("q.e", "n.e")}, 6) DESC, n.vec_id) AS INT) AS rank,
        |  n.vec_id AS neighbor_id,
        |  round(${cosSql("q.e", "n.e")}, 6) AS sim
        |FROM v q JOIN v n ON q.vec_id < $queryCount AND q.vec_id <> n.vec_id
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin)),

    // HARD-NEGATIVE MINING — the contrastive-training data shape: for
    // each query vector, the top-5 most-similar vectors with a
    // DIFFERENT label (nearest wrong-class examples — the negatives
    // that actually move a contrastive/triplet loss; random negatives
    // are mostly trivial). Same 20-query-panel exactness baseline as
    // ann_topk_bruteforce with the label-mismatch predicate fused into
    // the candidate join (filters pairs BEFORE scoring, not after
    // ranking); the 100 TB path is identical to ANN's — generate
    // candidates from the LSH/IVF rungs and apply the same mismatch
    // predicate at the candidate join.
    Entry("v_hard_negatives",
      (spark, dir) => hardNegativesFrom(emb(spark, dir)),
      Some(hardNegOracleSql)),

    Entry("ann_lsh_topk",
      (spark, dir) => {
        val b = emb(spark, dir).withColumn("bucket",
          VectorFunctions.lshBucket(col("e"), numPlanes, dims))
        val q = b.filter(col("vec_id") < queryCount)
          .select(col("vec_id").as("query_id"), col("e").as("qe"),
            col("nrm").as("qn"), col("bucket"))
        val n = b.select(col("vec_id").as("neighbor_id"), col("e").as("ne"),
          col("nrm").as("nn"), col("bucket").as("nbucket"))
        val scored = q.join(n, col("bucket") === col("nbucket") &&
            col("query_id") =!= col("neighbor_id"))
          .select(col("query_id"), col("bucket"), col("neighbor_id"),
            round(VectorFunctions.dot(col("qe"), col("ne")) /
              (col("qn") * col("nn")), 6).as("sim"))
        // map-side top-k carrying the query's bucket (constant per
        // query) through the groupBy — the topkTail shape
        scored.groupBy(col("query_id"), col("bucket"))
          .agg(graft.functions.TopKPairsAgg
            .topkPairs(-col("sim"), col("neighbor_id"), 3).as("tk"))
          .select(col("query_id"), col("bucket"),
            posexplode(col("tk")).as(Seq("pos", "x")))
          .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
            col("x.id").as("neighbor_id"), (-col("x.score")).as("sim"),
            col("bucket"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH v AS ($embSql),
        |b AS (SELECT vec_id, e, $bucketSql AS bucket FROM v)
        |SELECT q.vec_id AS query_id,
        |  CAST(row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY round(${cosSql("q.e", "n.e")}, 6) DESC, n.vec_id) AS INT) AS rank,
        |  n.vec_id AS neighbor_id,
        |  round(${cosSql("q.e", "n.e")}, 6) AS sim,
        |  q.bucket AS bucket
        |FROM b q JOIN b n ON q.bucket = n.bucket
        |  AND q.vec_id < $queryCount AND q.vec_id <> n.vec_id
        |QUALIFY rank <= 3
        |ORDER BY query_id, rank""".stripMargin)),

    // IVF (inverted-file) ANN: coarse-quantize every vector to its
    // nearest of `ivfCells` centroids, then answer each query by
    // probing only its `ivfProbes` nearest cells — the classic
    // cells-not-corpus ANN index (FAISS IVF-Flat shape). At 100 TB the
    // CELL is the partition key: the corpus is written partitioned by
    // cell, a query touches nprobe partitions, and recall/cost tunes
    // with nprobe — the missing middle between ann_topk_bruteforce
    // (exact, touches everything) and ann_lsh_topk (one fixed bucket).
    //
    // Centroids here are the first `ivfCells` vectors by id — a
    // deterministic seed choice (kmeans++-style seeding would then
    // ITERATE from exactly such a seed set) so the DuckDB oracle can
    // mirror the assignment exactly and the driver hash-checks the
    // whole index end-to-end. Lloyd iterations would change only the
    // centroid table, not the plan shape. Everything that scales is
    // slim: assignment/probing shuffle (vec_id, cid, csim) rows only;
    // the 64-dim vectors ride a broadcast (centroids) or an id-keyed
    // re-fetch join (final verification), never the candidate shuffle
    // — the dedup_embedding_lsh discipline.
    Entry("ann_ivf_topk",
      (spark, dir) => ivfTopkPairs(spark, dir)
        .orderBy(col("query_id"), col("rank")),
      Some(s"""WITH $ivfCteSql
        |SELECT cand.query_id,
        |  CAST(row_number() OVER (PARTITION BY cand.query_id
        |    ORDER BY round(${cosSql("q.e", "n.e")}, 6) DESC,
        |      cand.neighbor_id) AS INT) AS rank,
        |  cand.neighbor_id,
        |  round(${cosSql("q.e", "n.e")}, 6) AS sim
        |FROM cand JOIN v q ON q.vec_id = cand.query_id
        |  JOIN v n ON n.vec_id = cand.neighbor_id
        |QUALIFY rank <= $ivfTopK
        |ORDER BY query_id, rank""".stripMargin)),

    // ANN QUALITY MEASUREMENT — recall@5 of the IVF path against the
    // exact baseline, per query. This is the metric an ANN service
    // actually reports (and tunes nprobe against); with both paths
    // deterministic and oracle-mirrored, even the recall fractions
    // hash-match bit-for-bit. Scale shape: the ground-truth side is
    // the documented exactness baseline over the FIXED 20-query panel
    // (never the corpus × corpus), the IVF side probes cells, and the
    // comparison joins two k×queries-row sets — trivially small at any
    // corpus size. Recall tuning at 100 TB = re-running ONLY this row
    // while sweeping ivfProbes.
    Entry("ann_recall",
      (spark, dir) => {
        val exact = bruteTopkPairs(spark, dir)
          .select(col("query_id"), col("neighbor_id"))
        val approx = ivfTopkPairs(spark, dir)
          .select(col("query_id"), col("neighbor_id"))
          .withColumn("hit", lit(1))
        exact.join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_exact"),
            count(col("hit")).as("n_hit"))
          .withColumn("recall",
            round(col("n_hit") / col("n_exact"), 6))
          .orderBy(col("query_id"))
      },
      Some(s"""WITH $ivfCteSql,
        |iv AS (SELECT query_id, neighbor_id FROM (
        |  SELECT cand.query_id, cand.neighbor_id,
        |    row_number() OVER (PARTITION BY cand.query_id
        |      ORDER BY round(${cosSql("q.e", "n.e")}, 6) DESC,
        |        cand.neighbor_id) AS rank
        |  FROM cand JOIN v q ON q.vec_id = cand.query_id
        |    JOIN v n ON n.vec_id = cand.neighbor_id)
        |  WHERE rank <= $ivfTopK),
        |ex AS (SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(${cosSql("q.e", "n.e")}, 6) DESC, n.vec_id) AS rank
        |  FROM v q JOIN v n ON q.vec_id < $queryCount AND q.vec_id <> n.vec_id)
        |  WHERE rank <= 5)
        |SELECT ex.query_id, count(*) AS n_exact,
        |  count(iv.neighbor_id) AS n_hit,
        |  round(count(iv.neighbor_id) / count(*), 6) AS recall
        |FROM ex LEFT JOIN iv ON iv.query_id = ex.query_id
        |  AND iv.neighbor_id = ex.neighbor_id
        |GROUP BY ex.query_id ORDER BY ex.query_id""".stripMargin)),

    // IVF OVER TRAINED CENTROIDS — the full production
    // train→index→serve loop in ONE hash-checked row: 3 Lloyd rounds
    // refine the seed (exactly v_kmeans_lloyd3's trajectory, rounded
    // components and all), the corpus re-assigns to the trained
    // cells, and queries probe nprobe trained cells before exact
    // verification. This is how a real IVF index is actually built
    // (FAISS trains centroids before adding vectors); pairing it with
    // ann_ivf_topk (seed centroids) prices what training buys, the
    // same seed/trained pairing the PQ rung carries. The plan shape
    // is ann_ivf_topk's — training changes only the broadcast
    // centroid table, never the partitioning story.
    Entry("ann_ivf_trained_topk",
      (spark, dir) => ivfTrainedTopkPairs(spark, dir)
        .orderBy(col("query_id"), col("rank")),
      Some(ivfTrainedTopkOracleSql)),

    // MEASURED RECALL OF THE TRAINED-IVF RUNG — ann_recall's fold
    // over the trained index, completing the priced pair: recall@5
    // of seed-IVF (ann_recall) vs trained-IVF (this row) against the
    // same exact panel is the measured answer to "what did 3 Lloyd
    // rounds buy at this nprobe".
    Entry("ann_ivf_trained_recall",
      (spark, dir) => {
        val exact = bruteTopkPairs(spark, dir)
          .select(col("query_id"), col("neighbor_id"))
        val approx = ivfTrainedTopkPairs(spark, dir)
          .select(col("query_id"), col("neighbor_id"))
          .withColumn("hit", lit(1))
        exact.join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_exact"),
            count(col("hit")).as("n_hit"))
          .withColumn("recall",
            round(col("n_hit") / col("n_exact"), 6))
          .orderBy(col("query_id"))
      },
      Some(ivfTrainedRecallOracleSql)),

    // SEMANTIC DEDUPLICATION (the SemDeDup recipe, Abbas et al. 2023,
    // arXiv:2303.09540 — public paper): coarse-cluster the embedding
    // corpus, then drop near-duplicates WITHIN each cluster only,
    // keeping the lowest-id representative of every near-dup pair.
    // This is the missing rung between the exact all-pairs baseline
    // (dedup_embedding_near, Ω(n²)) and banded LSH
    // (dedup_embedding_lsh): the cluster id becomes the shuffle key,
    // so the comparison space is Σ|cell|² ≈ n²/k — at 100 TB the
    // corpus is written partitioned by cell and each task dedups one
    // cell, never the cross-corpus pair space. Candidate generation
    // rides SLIM (cell, vec_id) rows (the dedup_embedding_lsh
    // discipline); vectors are re-fetched by id only for candidate
    // pairs. Assignment reuses the deterministic IVF coarse quantizer
    // (seed centroids = first ivfCells vectors, rounded cosine,
    // lower-cid tiebreak), so the DuckDB oracle mirrors the whole
    // pipeline and the kept set hash-matches exactly.
    Entry("dedup_semantic",
      (spark, dir) => {
        val v = embSlim(spark, dir)
        // materialize the slim (vec_id, cell) assignment once: it is
        // referenced three times below (both self-join sides + the
        // final anti-join), and without this each reference re-scans
        // the corpus and re-runs the centroid argmax (the
        // pipe_curation manifest discipline; a written assignment
        // table at 100 TB)
        val asg = graft.core.VectorTools.assignCells(
            v.select(col("vec_id").as("id"), col("e")),
            ivfSeedCentroids(spark, dir))
          .select(col("id").as("vec_id"), col("cell"))
          .localCheckpoint()
        val a = asg.select(col("cell"), col("vec_id").as("v1"))
        val b = asg.select(col("cell").as("cell2"), col("vec_id").as("v2"))
        val cand = a.join(b,
            col("cell") === col("cell2") && col("v1") < col("v2"))
          .select(col("v1"), col("v2"))
        val dropped = cand
          .join(v.select(col("vec_id").as("v1"), col("e").as("e1"),
            col("nrm").as("n1")), "v1")
          .join(v.select(col("vec_id").as("v2"), col("e").as("e2"),
            col("nrm").as("n2")), "v2")
          .withColumn("sim",
            round(VectorFunctions.dot(col("e1"), col("e2")) /
              (col("n1") * col("n2")), 6))
          .filter(col("sim") >= nearDupThreshold)
          .select(col("v2").as("vec_id")).distinct()
        asg.join(dropped, Seq("vec_id"), "left_anti")
          .orderBy(col("vec_id"))
      },
      Some(semanticKeptOracleSql)),

    // SCALAR-QUANTIZATION ANN (the int8 compression every
    // billion-vector serving stack applies before anything else —
    // FAISS's SQ8 codec, public): per vector, scale s = max|x|/127,
    // q_i = floor(x_i/s + 0.5) ∈ [-127, 127]. The quantized cosine
    // Σ q_a·q_b / (‖q_a‖·‖q_b‖) cancels both scales, so scoring is
    // INTEGER-only arithmetic: at 100 TB the corpus ships as int8
    // (4× smaller than the float32 source — a quarter of the scan
    // and shuffle bytes), and the integer dot sums are exact, with
    // no float accumulation-order hazard between engines at all.
    // floor(x + 0.5), not round(): identical half-up semantics in
    // Spark and DuckDB, where round() ties differ.
    Entry("ann_quantized_topk",
      (spark, dir) => quantTopkPairs(spark, dir)
        .orderBy(col("query_id"), col("rank")),
      Some(s"""WITH $quantCteSql
        |SELECT q.vec_id AS query_id,
        |  CAST(row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY ${quantSimSql("q", "n")} DESC, n.vec_id) AS INT) AS rank,
        |  n.vec_id AS neighbor_id,
        |  ${quantSimSql("q", "n")} AS qsim
        |FROM qq q JOIN qq n
        |  ON q.vec_id < $queryCount AND q.vec_id <> n.vec_id
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin)),

    // Recall of int8 scoring against the exact float top-5 — the
    // measured answer to "what does 4× less IO cost in quality?"
    // (mirrors ann_recall, which does the same for IVF probing).
    Entry("ann_quantized_recall",
      (spark, dir) => {
        val exact = bruteTopkPairs(spark, dir)
          .select(col("query_id"), col("neighbor_id"))
        val approx = quantTopkPairs(spark, dir)
          .select(col("query_id"), col("neighbor_id"))
          .withColumn("hit", lit(1))
        exact.join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_exact"),
            count(col("hit")).as("n_hit"))
          .withColumn("recall",
            round(col("n_hit") / col("n_exact"), 6))
          .orderBy(col("query_id"))
      },
      Some(s"""WITH $quantCteSql,
        |qt AS (SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY ${quantSimSql("q", "n")} DESC, n.vec_id) AS rank
        |  FROM qq q JOIN qq n
        |    ON q.vec_id < $queryCount AND q.vec_id <> n.vec_id)
        |  WHERE rank <= 5),
        |ex AS (SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(${cosSql("q.e", "n.e")}, 6) DESC, n.vec_id) AS rank
        |  FROM v q JOIN v n ON q.vec_id < $queryCount AND q.vec_id <> n.vec_id)
        |  WHERE rank <= 5)
        |SELECT ex.query_id, count(*) AS n_exact,
        |  count(qt.neighbor_id) AS n_hit,
        |  round(count(qt.neighbor_id) / count(*), 6) AS recall
        |FROM ex LEFT JOIN qt ON qt.query_id = ex.query_id
        |  AND qt.neighbor_id = ex.neighbor_id
        |GROUP BY ex.query_id ORDER BY ex.query_id""".stripMargin)),

    // IVF + SQ8 COMPOSED (FAISS's IndexIVFScalarQuantizer layout, the
    // actual billion-vector production shape): candidate generation
    // probes nprobe cells exactly as ann_ivf_topk (float centroids,
    // the cell is the partition key at 100 TB), but candidate SCORING
    // reads only int8 — the corpus payload a production index
    // actually stores. The two rungs compose without interference:
    // cells bound the comparison space to Σ|probed cell|, int8 bounds
    // the bytes per comparison, and the integer dot sums keep scoring
    // exact cross-engine. This is the query the other ann_* rows are
    // rungs toward.
    Entry("ann_ivf_quantized_topk",
      (spark, dir) =>
        quantScoredTopk(spark, dir, ivfCandidates(spark, dir))
          .orderBy(col("query_id"), col("rank")),
      Some(ivfQuantTopkOracleSql)),

    // JOHNSON-LINDENSTRAUSS RANDOM PROJECTION (64 → 16 dims): each
    // output component is a dot against a deterministic md5-derived
    // hyperplane (the sign-LSH planes, reused unsliced), scaled by
    // 1/(1000·√16) to undo the integer-plane magnitude. JL says
    // pairwise angles survive within 1±ε at k = O(log n / ε²) — this
    // is the dimension-reduction rung under the ANN family: at 100 TB
    // the projected corpus is 4× slimmer, so candidate generation
    // (LSH bucketing, IVF assignment) runs on 16-dim rows and only
    // the final re-rank touches full vectors. Scan-local: no shuffle,
    // no join — the projection fuses into the parquet scan.
    Entry("v_random_project",
      (spark, dir) => {
        val projCols = (0 until rpDims).map { p =>
          val plane = array(VectorFunctions.planeComponents(p, dims)
            .map(c => lit(c.toDouble)): _*)
          round(VectorFunctions.dot(col("e"), plane) / 4000, 6)
            .as(s"p$p")
        }
        emb(spark, dir)
          .select(col("vec_id") +: projCols: _*)
          .orderBy(col("vec_id"))
      },
      Some {
        val comps = (0 until rpDims).map(p =>
          s"round(list_inner_product(e, ${planeSql(p)}) / 4000, 6) AS p$p")
          .mkString(",\n  ")
        s"""WITH v AS ($embSql)
           |SELECT vec_id,
           |  $comps
           |FROM v ORDER BY vec_id""".stripMargin
      }),

    // Recall of 16-dim PROJECTED scoring against the exact float
    // top-5 — the measured answer to "what does 4× slimmer cost when
    // the projection is used as the ONLY scorer?": ≈0.07 on the
    // driver corpus, vs int8's ≈0.98. The gap is the whole design
    // lesson, quantified: this corpus is near-orthogonal (true
    // cosines ≈ 0 ± a little), and JL at k=16 perturbs angles by
    // ±0.2-ish — enough to shuffle a tightly-bunched top-5 entirely.
    // So the projection's role at 100 TB is candidate GENERATION
    // (bucketing/cell assignment on 4× slimmer rows, where only
    // coarse geometry matters), never final scoring — full-vector or
    // int8 re-rank handles the shortlist, exactly how
    // ann_ivf_quantized_topk composes. Completes the per-rung quality
    // measurements: IVF → ann_recall, SQ8 → ann_quantized_recall,
    // JL → this row.
    Entry("ann_rp_recall",
      (spark, dir) => {
        val exact = bruteTopkPairs(spark, dir)
          .select(col("query_id"), col("neighbor_id"))
        val approx = rpTopkPairs(spark, dir)
          .select(col("query_id"), col("neighbor_id"))
          .withColumn("hit", lit(1))
        exact.join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_exact"),
            count(col("hit")).as("n_hit"))
          .withColumn("recall",
            round(col("n_hit") / col("n_exact"), 6))
          .orderBy(col("query_id"))
      },
      Some(s"""WITH v AS ($embSql),
        |$rpTailCteSql,
        |rt AS (SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY ${rpSimSql("q", "n")} DESC, n.vec_id) AS rank
        |  FROM pq q JOIN pq n
        |    ON q.vec_id < $queryCount AND q.vec_id <> n.vec_id)
        |  WHERE rank <= 5),
        |ex AS (SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(${cosSql("q.e", "n.e")}, 6) DESC, n.vec_id) AS rank
        |  FROM v q JOIN v n ON q.vec_id < $queryCount AND q.vec_id <> n.vec_id)
        |  WHERE rank <= 5)
        |SELECT ex.query_id, count(*) AS n_exact,
        |  count(rt.neighbor_id) AS n_hit,
        |  round(count(rt.neighbor_id) / count(*), 6) AS recall
        |FROM ex LEFT JOIN rt ON rt.query_id = ex.query_id
        |  AND rt.neighbor_id = ex.neighbor_id
        |GROUP BY ex.query_id ORDER BY ex.query_id""".stripMargin)),

    // PRODUCT QUANTIZATION (FAISS PQ8x4 layout, the third compression
    // codec after SQ8 and JL projection): split each vector into 8
    // subspaces of 8 dims, quantize every subvector to its nearest of
    // 16 per-subspace codebook centroids (codebook = the subvectors
    // of the first 16 corpus vectors — the same deterministic seed
    // the IVF coarse quantizer uses), and score queries against the
    // CODES ONLY via the classic ADC (asymmetric distance
    // computation): per query precompute the m×k table of
    // query-subvector → centroid distances, then a candidate's
    // approximate L2² is 8 table lookups summed. At 100 TB the corpus
    // ships as 4-byte codes (128× less than float64) and the
    // distance table is a ~2.5 KB broadcast per query — scoring never
    // touches a vector. All arithmetic runs on the fixed integer grid
    // (see [[pqGrid]]), so codes, tables and ADC sums are exact in
    // both engines with zero float-ordering hazard.
    Entry("ann_pq_topk",
      (spark, dir) => pqAdcTopk(spark, dir)
        .orderBy(col("query_id"), col("rank")),
      Some(pqTopkOracleSql)),

    // Recall of ADC-over-codes against the EXACT grid-L2 top-5 (the
    // very quantity PQ approximates) — isolates the codebook
    // approximation error from any metric mismatch, the same
    // "measured cost of the compression rung" discipline as
    // ann_quantized_recall (SQ8) and ann_rp_recall (JL).
    Entry("ann_pq_recall",
      (spark, dir) => {
        val exact = gridL2TopkPairs(spark, dir)
          .select(col("query_id"), col("neighbor_id"))
        val approx = pqAdcTopk(spark, dir)
          .select(col("query_id"), col("neighbor_id"))
          .withColumn("hit", lit(1))
        exact.join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_exact"),
            count(col("hit")).as("n_hit"))
          .withColumn("recall",
            round(col("n_hit") / col("n_exact"), 6))
          .orderBy(col("query_id"))
      },
      Some(s"""WITH $pqCteSql,
        |adc AS (SELECT dt.vec_id AS query_id, co.vec_id AS neighbor_id,
        |    CAST(sum(dt.d2) AS BIGINT) AS adc
        |  FROM pqc co JOIN pqd dt ON dt.s = co.s AND dt.cid = co.code
        |  WHERE dt.vec_id < $queryCount AND dt.vec_id <> co.vec_id
        |  GROUP BY dt.vec_id, co.vec_id),
        |pt AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id, row_number() OVER (
        |    PARTITION BY query_id ORDER BY adc, neighbor_id) AS rank
        |  FROM adc) WHERE rank <= 5),
        |exg AS (SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_inner_product(q.g, q.g)
        |        - 2 * list_inner_product(q.g, n.g)
        |        + list_inner_product(n.g, n.g),
        |      n.vec_id) AS rank
        |  FROM gv q JOIN gv n
        |    ON q.vec_id < $queryCount AND q.vec_id <> n.vec_id)
        |  WHERE rank <= 5)
        |SELECT exg.query_id, count(*) AS n_exact,
        |  count(pt.neighbor_id) AS n_hit,
        |  round(count(pt.neighbor_id) / count(*), 6) AS recall
        |FROM exg LEFT JOIN pt ON pt.query_id = exg.query_id
        |  AND pt.neighbor_id = exg.neighbor_id
        |GROUP BY exg.query_id ORDER BY exg.query_id""".stripMargin)),

    // IVF + PQ COMPOSED (FAISS's IndexIVFPQ — the billion-vector
    // default): candidate generation probes nprobe cells exactly as
    // ann_ivf_topk (float centroids, the cell partitions the corpus),
    // candidate SCORING reads only the 4-byte PQ codes via ADC. The
    // sibling of ann_ivf_quantized_topk one compression rung further:
    // cells bound the comparison space, codes bound the bytes per
    // comparison at 128× instead of SQ8's 4×.
    Entry("ann_ivf_pq_topk",
      (spark, dir) =>
        pqAdcScoredTopk(spark, dir, ivfCandidates(spark, dir))
          .orderBy(col("query_id"), col("rank")),
      Some(s"""WITH $ivfCteSql,
        |$pqTailCteSql,
        |adcc AS (SELECT ca.query_id, ca.neighbor_id,
        |    CAST(sum(dt.d2) AS BIGINT) AS adc
        |  FROM cand ca
        |  JOIN pqc co ON co.vec_id = ca.neighbor_id
        |  JOIN pqd dt ON dt.vec_id = ca.query_id
        |    AND dt.s = co.s AND dt.cid = co.code
        |  GROUP BY ca.query_id, ca.neighbor_id)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY adc, neighbor_id) AS INT) AS rank,
        |  neighbor_id, adc
        |FROM adcc QUALIFY rank <= $ivfTopK
        |ORDER BY query_id, rank""".stripMargin)),

    // TRAINED PQ CODEBOOKS — the step that makes PQ real in FAISS:
    // one k-means M-step per subspace refines the seeded codebook to
    // the element-wise mean of each code's assigned subvectors (the
    // v_kmeans_lloyd3 machinery applied per subspace; FAISS iterates
    // this 25×, one round demonstrates the full distributed shape:
    // slim (s, code, pos) partial aggs, nothing driver-side). Means
    // over integer-grid components are exact rationals S/n — centroids
    // need NO rounding; refined distances leave the integer grid, so
    // they are micro-quantized scan-locally (floor(d2·10⁶ + 0.5))
    // to restore order-independent exact ADC sums and tie-stable
    // argmin cross-engine.
    Entry("ann_pq_trained_topk",
      (spark, dir) => {
        // the trained codebook is 128 rows but derives from a
        // full-corpus M-step agg — pin it once for its two consumers
        // (scan-local codes + the panel distance table)
        val tcb = pqTrainedCodebook(spark, dir).localCheckpoint()
        pqAdcRanked(queryDist(spark, dir, tcb, quantize = true),
          codesWithSlices(subSlices(spark, gridded(spark, dir)), tcb,
            quantize = true),
          identity, 5)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(pqTrainedTopkOracleSql)),

    // The measured payoff of training: recall@5 of trained-codebook
    // ADC vs the exact grid-L2 top-5, directly comparable to
    // ann_pq_recall's seeded-codebook number. On this corpus one
    // round moves ≈0.20 → ≈0.21: near-orthogonal random vectors have
    // tightly-bunched distances, so 4-byte codes cannot separate a
    // top-5 regardless of codebook quality — the same measured lesson
    // as ann_rp_recall (0.07) vs int8 (0.98): PQ codes at this corpus
    // geometry are a candidate-generation/coarse-ranking device, and
    // the final list needs an int8 or float re-rank. On real
    // embedding corpora (clustered, anisotropic) trained codebooks
    // are what closes most of that gap, which is why FAISS iterates
    // this exact M-step 25×.
    Entry("ann_pq_trained_recall",
      (spark, dir) => {
        val exact = gridL2TopkPairs(spark, dir)
          .select(col("query_id"), col("neighbor_id"))
        val tcb = pqTrainedCodebook(spark, dir).localCheckpoint()
        val approx = pqAdcRanked(queryDist(spark, dir, tcb, quantize = true),
          codesWithSlices(subSlices(spark, gridded(spark, dir)), tcb,
            quantize = true),
          identity, 5)
          .select(col("query_id"), col("neighbor_id"))
          .withColumn("hit", lit(1))
        exact.join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_exact"),
            count(col("hit")).as("n_hit"))
          .withColumn("recall",
            round(col("n_hit") / col("n_exact"), 6))
          .orderBy(col("query_id"))
      },
      Some(s"""WITH $pqCteSql,
        |$pqTrainedTailCteSql,
        |adct AS (SELECT dt.vec_id AS query_id, co.vec_id AS neighbor_id,
        |    CAST(sum(dt.dm) AS BIGINT) AS adc
        |  FROM pqct co JOIN pqdt dt ON dt.s = co.s AND dt.cid = co.code
        |  WHERE dt.vec_id < $queryCount AND dt.vec_id <> co.vec_id
        |  GROUP BY dt.vec_id, co.vec_id),
        |pt AS (SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id, row_number() OVER (
        |    PARTITION BY query_id ORDER BY adc, neighbor_id) AS rank
        |  FROM adct) WHERE rank <= 5),
        |exg AS (SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_inner_product(q.g, q.g)
        |        - 2 * list_inner_product(q.g, n.g)
        |        + list_inner_product(n.g, n.g),
        |      n.vec_id) AS rank
        |  FROM gv q JOIN gv n
        |    ON q.vec_id < $queryCount AND q.vec_id <> n.vec_id)
        |  WHERE rank <= 5)
        |SELECT exg.query_id, count(*) AS n_exact,
        |  count(pt.neighbor_id) AS n_hit,
        |  round(count(pt.neighbor_id) / count(*), 6) AS recall
        |FROM exg LEFT JOIN pt ON pt.query_id = exg.query_id
        |  AND pt.neighbor_id = exg.neighbor_id
        |GROUP BY exg.query_id ORDER BY exg.query_id""".stripMargin)),

    // 1-BIT BINARY (SIGN) QUANTIZATION — the bottom rung of the
    // compression ladder this family measures end to end (float32 →
    // int8 SQ → PQ8×4 → 1 bit/dim): bit i is set iff component i is
    // positive, packed into TWO 32-bit words held in BIGINTs. 64 bits
    // = 8 bytes/vector, a 32× reduction of the float32 source — the
    // format binary-quantized vector stores (FAISS's
    // IndexBinaryFlat; sign quantization after PCA/OPQ rotation is
    // the public-standard recipe) ship and scan at 100 TB. Packing is
    // 64 unrolled codegen terms summed as DISTINCT powers of two
    // (exact — each power appears at most once) fused into the
    // parquet scan: no shuffle, no UDF. The split across two words
    // keeps every term off a BIGINT's sign bit — `1L << 63` wraps
    // negative, and signed-overflow semantics are exactly the
    // engine-specific hazard the integer-grid discipline avoids.
    Entry("v_sign_bits",
      (spark, dir) => signPacked(spark, dir).orderBy(col("vec_id")),
      Some(s"""WITH v AS ($embSql),
        |$signCteSql
        |SELECT vec_id, lo, hi FROM sb ORDER BY vec_id""".stripMargin)),

    // HAMMING-DISTANCE ANN over the packed sign bits: score = popcount
    // of the XOR of the 64-bit codes — for unit-ish vectors the
    // Hamming distance estimates the angle (each plane the sign of one
    // component; collision probability 1 − θ/π, the sign-LSH bound),
    // so ranking by it approximates cosine ranking at 1/32 of the
    // bytes and ~1 cycle per comparison (two XOR+POPCNT pairs). The
    // panel-broadcast shape of the other rungs (20 query codes
    // broadcast, corpus scanned once); scoring integers end to end,
    // so cross-engine exact. At 100 TB this is the cheap FIRST filter
    // before SQ8/PQ rescoring — the recall row below prices exactly
    // that choice.
    Entry("ann_hamming_topk",
      (spark, dir) => hammingTopkPairs(spark, dir)
        .orderBy(col("query_id"), col("rank")),
      Some(hammingTopkOracleSql)),

    // Recall of 1-bit Hamming ranking against the exact float top-5 —
    // the measured answer to "what does 32× less IO cost in quality?"
    // (completing the priced ladder: ann_recall prices IVF probing,
    // ann_quantized_recall prices int8, ann_pq_recall prices PQ8×4,
    // ann_rp_recall prices 16-dim projection).
    Entry("ann_hamming_recall",
      (spark, dir) => {
        val exact = bruteTopkPairs(spark, dir)
          .select(col("query_id"), col("neighbor_id"))
        val approx = hammingTopkPairs(spark, dir)
          .select(col("query_id"), col("neighbor_id"))
          .withColumn("hit", lit(1))
        exact.join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_exact"),
            count(col("hit")).as("n_hit"))
          .withColumn("recall",
            round(col("n_hit") / col("n_exact"), 6))
          .orderBy(col("query_id"))
      },
      Some(s"""WITH v AS ($embSql),
        |$signCteSql,
        |ht AS (SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY ${hammingSql("q", "n")}, n.vec_id) AS rank
        |  FROM sb q JOIN sb n
        |    ON q.vec_id < $queryCount AND q.vec_id <> n.vec_id)
        |  WHERE rank <= 5),
        |ex AS (SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(${cosSql("q.e", "n.e")}, 6) DESC, n.vec_id) AS rank
        |  FROM v q JOIN v n ON q.vec_id < $queryCount AND q.vec_id <> n.vec_id)
        |  WHERE rank <= 5)
        |SELECT ex.query_id, count(*) AS n_exact,
        |  count(ht.neighbor_id) AS n_hit,
        |  round(count(ht.neighbor_id) / count(*), 6) AS recall
        |FROM ex LEFT JOIN ht ON ht.query_id = ex.query_id
        |  AND ht.neighbor_id = ex.neighbor_id
        |GROUP BY ex.query_id ORDER BY ex.query_id""".stripMargin)),

    // IVF + BINARY COMPOSED — the third column of the IVF×codec grid
    // (ann_ivf_quantized_topk composes IVF with SQ8, ann_ivf_pq_topk
    // with PQ; this row scores the SAME nprobe-cell candidates on the
    // 8-byte sign codes). Cells bound the comparison space to
    // Σ|probed cell|, the binary codes bound the bytes per comparison
    // at 32× — at 100 TB this is the cheapest servable layout of all:
    // the scanned index partition is cells × 8 bytes/member, and
    // scoring is two XOR+POPCNT per candidate. Equi-joins only —
    // candidates fetch codes by id; no BNLJ anywhere on this row.
    Entry("ann_ivf_hamming_topk",
      (spark, dir) =>
        hammingScoredTopk(spark, dir, ivfCandidates(spark, dir))
          .orderBy(col("query_id"), col("rank")),
      Some(s"""WITH $ivfCteSql,
        |$signCteSql
        |SELECT c.query_id,
        |  CAST(row_number() OVER (PARTITION BY c.query_id
        |    ORDER BY ${hammingSql("q", "n")}, c.neighbor_id) AS INT) AS rank,
        |  c.neighbor_id,
        |  CAST(${hammingSql("q", "n")} AS INTEGER) AS hamming
        |FROM cand c JOIN sb q ON q.vec_id = c.query_id
        |  JOIN sb n ON n.vec_id = c.neighbor_id
        |QUALIFY rank <= $ivfTopK
        |ORDER BY query_id, rank""".stripMargin)),

    // BINARY SHORTLIST → INT8 RERANK — the two-stage serving path
    // production binary indexes actually run (scan the 1-bit codes to
    // shortlist [[rerankShortlist]] candidates per query, rescore only
    // those on int8): the Hamming scan touches 8 bytes/vector across
    // the corpus, the rerank touches 64 int8 bytes for 50 rows per
    // query — at 100 TB the full-precision corpus is read at
    // shortlist-cardinality, not corpus-cardinality. The recall row
    // below shows the shortlist recovers int8's quality (≈0.98) at
    // binary-scan cost — the measured argument for the two-stage
    // layout over either single-stage extreme.
    Entry("ann_hamming_rerank_topk",
      (spark, dir) => quantScoredTopk(spark, dir,
          hammingTopkFrom(spark, dir, signPacked(spark, dir),
              rerankShortlist)
            .select(col("query_id"), col("neighbor_id")))
        .orderBy(col("query_id"), col("rank")),
      Some(hammingRerankOracleSql)),

    // Recall of shortlist+rerank against the exact float top-5 — the
    // ladder's composition argument, measured: binary-only ranking
    // (ann_hamming_recall) loses what the 64-bit code can't separate,
    // but as a CANDIDATE GENERATOR feeding an int8 rerank it recovers
    // nearly all of int8's direct quality.
    Entry("ann_hamming_rerank_recall",
      (spark, dir) => {
        val exact = bruteTopkPairs(spark, dir)
          .select(col("query_id"), col("neighbor_id"))
        val approx = quantScoredTopk(spark, dir,
            hammingTopkFrom(spark, dir, signPacked(spark, dir),
                rerankShortlist)
              .select(col("query_id"), col("neighbor_id")))
          .select(col("query_id"), col("neighbor_id"))
          .withColumn("hit", lit(1))
        exact.join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_exact"),
            count(col("hit")).as("n_hit"))
          .withColumn("recall",
            round(col("n_hit") / col("n_exact"), 6))
          .orderBy(col("query_id"))
      },
      Some(s"""WITH v AS ($embSql),
        |$signCteSql,
        |$quantTailCteSql,
        |h AS (SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY ${hammingSql("q", "n")}, n.vec_id) AS r
        |  FROM sb q JOIN sb n
        |    ON q.vec_id < $queryCount AND q.vec_id <> n.vec_id)
        |  WHERE r <= $rerankShortlist),
        |rr AS (SELECT query_id, neighbor_id FROM (
        |  SELECT h.query_id, h.neighbor_id,
        |    row_number() OVER (PARTITION BY h.query_id
        |      ORDER BY ${quantSimSql("q", "n")} DESC, h.neighbor_id)
        |      AS rank
        |  FROM h JOIN qq q ON q.vec_id = h.query_id
        |    JOIN qq n ON n.vec_id = h.neighbor_id)
        |  WHERE rank <= $ivfTopK),
        |ex AS (SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(${cosSql("q.e", "n.e")}, 6) DESC, n.vec_id) AS rank
        |  FROM v q JOIN v n ON q.vec_id < $queryCount AND q.vec_id <> n.vec_id)
        |  WHERE rank <= 5)
        |SELECT ex.query_id, count(*) AS n_exact,
        |  count(rr.neighbor_id) AS n_hit,
        |  round(count(rr.neighbor_id) / count(*), 6) AS recall
        |FROM ex LEFT JOIN rr ON rr.query_id = ex.query_id
        |  AND rr.neighbor_id = ex.neighbor_id
        |GROUP BY ex.query_id ORDER BY ex.query_id""".stripMargin))
  )

  /** Shared with StreamingOps (s30): the incremental semantic-dedup
    * decision stream must converge to exactly this batch kept set. */
  private[queries] val semanticKeptOracleSql: String =
    s"""WITH v AS ($embSql),
       |c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < $ivfCells),
       |s AS (SELECT v.vec_id, c.cid,
       |    round(${cosSql("v.e", "c.ce")}, 6) AS csim
       |  FROM v CROSS JOIN c),
       |asg AS (SELECT vec_id, cid AS cell FROM (
       |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY csim DESC, cid) AS r FROM s) WHERE r = 1),
       |dropped AS (SELECT DISTINCT b.vec_id
       |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  JOIN v va ON va.vec_id = a.vec_id
       |  JOIN v vb ON vb.vec_id = b.vec_id
       |  WHERE round(${cosSql("va.e", "vb.e")}, 6) >= $nearDupThreshold)
       |SELECT asg.vec_id, asg.cell FROM asg
       |WHERE asg.vec_id NOT IN (SELECT vec_id FROM dropped)
       |ORDER BY asg.vec_id""".stripMargin

  /** Exact cosine top-5 for the fixed query panel (the allow-listed
    * tiny-broadcast BNLJ: $queryCount query vectors against the
    * corpus) — shared by ann_topk_bruteforce and ann_recall's ground
    * truth. No trailing sort; callers order (or aggregate) the pairs. */
  /** One 32-dim half of the sign bitmap: bit i of the word is set iff
    * e[off+i] > 0. 32 unrolled codegen terms, summed — each term a
    * distinct power of two, so the sum IS the bit pattern and can
    * never overflow; fuses into the parquet scan. Split across two
    * words (lo = dims 0..31, hi = dims 32..63) so no term touches a
    * BIGINT's sign bit. */
  private def signWord(e: Column, off: Int): Column =
    (0 until 32).map { i =>
      when(element_at(e, off + i + 1) > lit(0d), lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Pack a (vec_id, e) frame to (vec_id, lo, hi) sign bitmaps —
    * scan-local; shared with the streamed encoder (s53), whose
    * microbatches run exactly this projection. */
  private[queries] def signPackedFrom(df: DataFrame): DataFrame =
    df.select(col("vec_id"),
      signWord(col("e"), 0).as("lo"), signWord(col("e"), 32).as("hi"))

  /** The corpus as (vec_id, lo, hi) packed sign bitmaps — shared by
    * v_sign_bits, the Hamming rungs, and the streamed serving twin. */
  private[queries] def signPacked(spark: SparkSession, dir: String): DataFrame =
    signPackedFrom(emb(spark, dir))

  /** DuckDB twin of [[signPacked]], assuming a `v` corpus CTE in
    * scope: unnest with subscripts, shift each positive component's
    * bit into its word. */
  private[queries] val signCteSql: String =
    """sb AS (SELECT vec_id,
      |  CAST(COALESCE(sum(CASE WHEN val > 0 AND idx <= 32
      |    THEN 1::BIGINT << (idx - 1) ELSE 0 END), 0) AS BIGINT) AS lo,
      |  CAST(COALESCE(sum(CASE WHEN val > 0 AND idx > 32
      |    THEN 1::BIGINT << (idx - 33) ELSE 0 END), 0) AS BIGINT) AS hi
      |  FROM (SELECT vec_id, unnest(e) AS val,
      |    generate_subscripts(e, 1) AS idx FROM v)
      |  GROUP BY vec_id)""".stripMargin

  /** popcount(a XOR b) over both words — integer end to end. */
  private def hammingDist(qlo: Column, qhi: Column,
                          nlo: Column, nhi: Column): Column =
    (bit_count(qlo.bitwiseXOR(nlo)) +
      bit_count(qhi.bitwiseXOR(nhi))).cast("int")

  private[queries] def hammingSql(a: String, b: String): String =
    s"bit_count(xor($a.lo, $b.lo)) + bit_count(xor($a.hi, $b.hi))"

  /** The Hamming serving tail: score the standing query panel (batch
    * sign codes of vec_id < [[queryCount]]) against an arbitrary
    * (vec_id, lo, hi) code table — shared by ann_hamming_topk (codes
    * = the batch corpus) and the streamed index twin s53 (codes = the
    * converged state table). */
  private[queries] def hammingTopkFrom(spark: SparkSession, dir: String,
                                       codes: DataFrame,
                                       k: Int = 5): DataFrame = {
    val q = signPacked(spark, dir).filter(col("vec_id") < queryCount)
      .select(col("vec_id").as("query_id"),
        col("lo").as("qlo"), col("hi").as("qhi"))
    val n = codes.select(col("vec_id").as("neighbor_id"),
      col("lo").as("nlo"), col("hi").as("nhi"))
    val scored = broadcast(q).join(n, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        hammingDist(col("qlo"), col("qhi"), col("nlo"), col("nhi"))
          .as("hamming"))
    topkTail(scored, k, "hamming", desc = false, outType = "int")
  }

  /** Map-side per-query top-k over a scored (query_id, neighbor_id,
    * <scoreCol>) set: the mergeable [[TopKPairsAgg]] replaces the
    * `row_number` window every serving tail used to rank with — the
    * window shuffles EVERY scored row to one reducer per query (20
    * reducers regardless of cluster size), where the aggregate
    * retains ≤ k pairs per query per partition BEFORE the exchange,
    * so at 100 TB the shuffle carries k·queries·partitions pairs,
    * not the scored candidate set. Descending ranks negate through
    * the aggregate (IEEE negation round-trips bit-for-bit), integer
    * scores ride the double lane exactly (|score| ≤ 128 ≪ 2^53).
    *
    * INVARIANT: scores must be non-NULL and non-NaN. The aggregate
    * silently DROPS nulls (where the replaced row_number window
    * ranked them last) and a desc sort would rank NaN last where the
    * window ranked it FIRST (Spark orders NaN above every double) —
    * either would silently diverge from a window-based oracle. Every
    * call site holds it (cosine over positive norms, Hamming/ADC
    * ints), so a zero-norm vector reaching a cosine tail is a BUG
    * upstream: the guard fails the job loudly instead of reordering
    * silently. */
  private[queries] def topkTail(scored: DataFrame, k: Int, scoreCol: String,
                                desc: Boolean,
                                outType: String = "double"): DataFrame = {
    val raw = col(scoreCol).cast("double")
    val s0 = when(raw.isNull || raw.isNaN,
      raise_error(concat(lit(s"topkTail: NULL/NaN $scoreCol for pair ("),
        col("query_id"), lit(","), col("neighbor_id"), lit(")"))))
      .otherwise(raw)
    val s = if (desc) -s0 else s0
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKPairsAgg
        .topkPairs(s, col("neighbor_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "x")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("x.id").as("neighbor_id"), {
          val v = if (desc) -col("x.score") else col("x.score")
          (if (outType == "double") v else v.cast(outType)).as(scoreCol)
        })
  }

  /** Hamming scoring + top-k over an arbitrary (query_id, neighbor_id)
    * candidate set — the binary twin of [[quantScoredTopk]] (equi-joins
    * only: candidates fetch their 8-byte codes by id). */
  private def hammingScoredTopk(spark: SparkSession, dir: String,
                                cand: DataFrame): DataFrame = {
    val sb = signPacked(spark, dir)
    val q = sb.select(col("vec_id").as("query_id"),
      col("lo").as("qlo"), col("hi").as("qhi"))
    val n = sb.select(col("vec_id").as("neighbor_id"),
      col("lo").as("nlo"), col("hi").as("nhi"))
    val scored = cand.join(q, "query_id").join(n, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        hammingDist(col("qlo"), col("qhi"), col("nlo"), col("nhi"))
          .as("hamming"))
    topkTail(scored, ivfTopK, "hamming", desc = false, outType = "int")
  }

  /** Hamming top-5 for the fixed query panel — the 1-bit twin of
    * [[bruteTopkPairs]] (same allow-listed tiny-broadcast BNLJ: the
    * 20-code query panel against the corpus codes). */
  private def hammingTopkPairs(spark: SparkSession, dir: String): DataFrame =
    hammingTopkFrom(spark, dir, signPacked(spark, dir))

  /** Shared with StreamingOps (s53): the streamed sign-bit index must
    * serve exactly the batch Hamming panel answer. */
  private[queries] def hammingTopkOracleSql: String =
    s"""WITH v AS ($embSql),
       |$signCteSql
       |SELECT q.vec_id AS query_id,
       |  CAST(row_number() OVER (PARTITION BY q.vec_id
       |    ORDER BY ${hammingSql("q", "n")}, n.vec_id) AS INT) AS rank,
       |  n.vec_id AS neighbor_id,
       |  CAST(${hammingSql("q", "n")} AS INTEGER) AS hamming
       |FROM sb q JOIN sb n
       |  ON q.vec_id < $queryCount AND q.vec_id <> n.vec_id
       |QUALIFY rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** The two-stage (Hamming shortlist → int8 rerank) oracle. */
  private def hammingRerankOracleSql: String =
    s"""WITH v AS ($embSql),
       |$signCteSql,
       |$quantTailCteSql,
       |h AS (SELECT query_id, neighbor_id FROM (
       |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${hammingSql("q", "n")}, n.vec_id) AS r
       |  FROM sb q JOIN sb n
       |    ON q.vec_id < $queryCount AND q.vec_id <> n.vec_id)
       |  WHERE r <= $rerankShortlist)
       |SELECT h.query_id,
       |  CAST(row_number() OVER (PARTITION BY h.query_id
       |    ORDER BY ${quantSimSql("q", "n")} DESC, h.neighbor_id) AS INT)
       |    AS rank,
       |  h.neighbor_id,
       |  ${quantSimSql("q", "n")} AS qsim
       |FROM h JOIN qq q ON q.vec_id = h.query_id
       |  JOIN qq n ON n.vec_id = h.neighbor_id
       |QUALIFY rank <= $ivfTopK
       |ORDER BY query_id, rank""".stripMargin

  private def bruteTopkPairs(spark: SparkSession, dir: String): DataFrame = {
    val q = emb(spark, dir).filter(col("vec_id") < queryCount)
      .select(col("vec_id").as("query_id"), col("e").as("qe"),
        col("nrm").as("qn"))
    val n = emb(spark, dir)
      .select(col("vec_id").as("neighbor_id"), col("e").as("ne"),
        col("nrm").as("nn"))
    val scored = broadcast(q).join(n, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorFunctions.dot(col("qe"), col("ne")) /
          (col("qn") * col("nn")), 6).as("sim"))
    topkTail(scored, 5, "sim", desc = true)
  }

  /** The IVF candidate generator (assign → probe nprobe cells) —
    * shared by ivfTopkPairs and the IVF+SQ8 composition. */
  private def ivfCandidates(spark: SparkSession, dir: String): DataFrame =
    ivfCandidatesOn(emb(spark, dir), queryCount)

  /** [[ivfCandidates]] over an ARBITRARY (vec_id, e, nrm) base — the
    * rungs consume any id+vector input, and the media composition
    * (ann_media_ivf_topk) proves it with a hash check: pooled media
    * features index and probe through exactly this pipeline. */
  private[queries] def ivfCandidatesOn(base: DataFrame,
                                       nq: Int): DataFrame =
    ivfCandidatesWith(base,
      base.filter(col("vec_id") < ivfCells)
        .select(col("vec_id").as("cid"), col("e").as("ce"),
          col("nrm").as("cn")),
      nq)

  /** [[ivfCandidatesOn]] against a SUPPLIED centroid table
    * (cid, ce, cn) — the seed variant passes the first-ivfCells
    * vectors, the trained variant (ann_ivf_trained_topk) the Lloyd
    * output. The centroid SOURCE is the only difference; assignment,
    * probe selection and tiebreaks are identical. */
  /** SCAN-LOCAL nearest-cell assignment over (vec_id, e, nrm) rows
    * against a (cid, ce, cn) centroid table: (vec_id, e, nrm, cell),
    * the input row carried through. The k-way argmax runs per row
    * against a one-row broadcast array of the centroids, so the plan
    * has no exchange; arithmetic and tie-break are bit-identical to
    * the former crossJoin + groupBy(vec_id) max_by shape — the same
    * round(dot/(nrm·cn), 6) per (vector, centroid) and the same
    * (csim DESC, cid ASC) winner via the (csim, −cid) struct max. An
    * empty centroid table yields no rows (the size>0 filter empties
    * the crossJoin exactly as an empty broadcast build side did).
    * NOTE: unlike the groupBy form this does not collapse duplicate
    * vec_ids inside one input — callers feed PK-unique rows (the
    * embeddings corpus / its replay chunks). Shared by the batch IVF
    * candidate generator and the incremental assignment microbatches
    * (s25/s44/s30), whose relays must assign identically. */
  private[queries] def assignScan(vecs: DataFrame, cent: DataFrame): DataFrame = {
    val centArr = broadcast(cent
      .select(struct(col("cid"), col("ce"), col("cn")).as("c"))
      .agg(sort_array(collect_list(col("c"))).as("cents"))
      .filter(size(col("cents")) > 0))
    vecs.crossJoin(centArr)
      .select(col("vec_id"), col("e"), col("nrm"),
        (-array_max(transform(col("cents"), c =>
          struct(
            round(VectorFunctions.dot(col("e"), c.getField("ce")) /
              (col("nrm") * c.getField("cn")), 6).as("csim"),
            (-c.getField("cid")).as("ncid")))).getField("ncid"))
          .as("cell"))
  }

  private[queries] def ivfCandidatesWith(base: DataFrame, cent: DataFrame,
                                         nq: Int): DataFrame = {
    // SCAN-LOCAL cell assignment (the VectorTools.assignFull / PQ
    // codesWithSlices fusion applied to the IVF rung): the k-way
    // argmax runs per row against a one-row broadcast array of the k
    // centroids, so assignment plans with no exchange and the former
    // (vector × centroid) scored-row materialization (n×cells rows
    // through a localCheckpoint, funneled back through a
    // groupBy(vec_id) argmax) disappears. Arithmetic and tie-break
    // are bit-identical: the same round(dot/(nrm·cn), 6) per
    // (vector, centroid) and the same (csim DESC, cid ASC) winner
    // via the lexicographic struct max over (csim, −cid) — the
    // former max_by(cid, struct(csim, −cid)). An empty centroid
    // table still yields no assignments (the size>0 filter empties
    // the crossJoin exactly as the former broadcast did).
    val asg = assignScan(base, cent).select(col("vec_id"), col("cell"))
    // Probe selection is itself a top-k tail (k = nprobe cells per
    // query, csim DESC with ties to the lower cid — TopKPairsAgg's
    // (neg-score ASC, id ASC) order exactly): the same mergeable
    // map-side aggregate as every serving tail, so the nprobe-trim
    // runs before the exchange instead of a row_number window
    // shipping all queries×cells scored rows to per-query reducers.
    // Scored rows exist only for the PANEL (nq×cells — the filter
    // runs before the centroid fan-out, not over a materialized
    // corpus×cells matrix).
    val probes = topkTail(
        base.filter(col("vec_id") < nq).crossJoin(broadcast(cent))
          .select(col("vec_id").as("query_id"),
            col("cid").as("neighbor_id"),
            round(VectorFunctions.dot(col("e"), col("ce")) /
              (col("nrm") * col("cn")), 6).as("csim")),
        ivfProbes, "csim", desc = true)
      .select(col("query_id"), col("neighbor_id").as("pcell"))
    // Cells partition the corpus, so each neighbor appears at most
    // once per probed cell — no pair dedup needed.
    probes.join(asg, col("pcell") === col("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
  }

  /** The IVF probe pipeline (assign → probe nprobe cells → verify
    * candidates) — shared by ann_ivf_topk and ann_recall. */
  private def ivfTopkPairs(spark: SparkSession, dir: String): DataFrame =
    ivfTopkPairsOn(emb(spark, dir), queryCount)

  /** [[ivfTopkPairs]] over an arbitrary (vec_id, e, nrm) base —
    * candidates from [[ivfCandidatesOn]], full-precision verify,
    * map-side top-k. */
  private[queries] def ivfTopkPairsOn(base: DataFrame,
                                      nq: Int): DataFrame =
    ivfVerifiedTopk(base, ivfCandidatesOn(base, nq))

  /** Full-precision verification + mergeable map-side top-k over an
    * arbitrary (query_id, neighbor_id) candidate set — the exact-cos
    * serving tail shared by the seed and trained IVF rungs. */
  private def ivfVerifiedTopk(base: DataFrame, cand: DataFrame): DataFrame = {
    val q = base.select(col("vec_id").as("query_id"),
      col("e").as("qe"), col("nrm").as("qn"))
    val n = base.select(col("vec_id").as("neighbor_id"),
      col("e").as("ne"), col("nrm").as("nn"))
    val scored = cand.join(q, "query_id").join(n, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        round(VectorFunctions.dot(col("qe"), col("ne")) /
          (col("qn") * col("nn")), 6).as("sim"))
    topkTail(scored, ivfTopK, "sim", desc = true)
  }

  /** IVF probing against TRAINED centroids — the full production
    * train→index→serve loop in one row: 3 Lloyd rounds refine the
    * seed (exactly v_kmeans_lloyd3's trajectory), the corpus assigns
    * to the trained cells, queries probe nprobe trained cells, and
    * candidates verify at full precision through the mergeable top-k
    * (the ann_pq_trained pairing applied to the IVF rung). Training
    * changes only the centroid table — the plan shape, partitioning
    * story and every tiebreak are ann_ivf_topk's. */
  private def ivfTrainedTopkPairs(spark: SparkSession,
                                  dir: String): DataFrame = {
    val base = emb(spark, dir)
    val vectors = base.select(col("vec_id").as("id"), col("e"))
    val seed = vectors.filter(col("id") < ivfCells)
      .select(col("id").as("cid"), col("e").as("ce"))
    val cent = graft.core.VectorTools.lloyd(vectors, seed, 3)
      .select(col("cid"), col("ce"),
        VectorFunctions.norm(col("ce")).as("cn"))
    ivfVerifiedTopk(base, ivfCandidatesWith(base, cent, queryCount))
  }

  /** The IVF candidate-generation CTE chain (v → centroids → scored →
    * assignment + probes → candidates) — shared by the ann_ivf_topk
    * and ann_recall oracles. */
  private def ivfCteSql: String =
    s"""v AS ($embSql),
       |${ivfChainSql(queryCount)}"""

  /** The chain AFTER the `v` corpus CTE, parameterized on the query
    * panel size — shared by the embeddings oracles (via [[ivfCteSql]])
    * and the media composition's oracle, whose `v` is the pooled
    * feature table instead. */
  private[queries] def ivfChainSql(nq: Int): String =
    s"""c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < $ivfCells),
       |${ivfProbeChainSql("c", nq)}""".stripMargin

  /** The assign → probe → candidate chain against an ARBITRARY
    * centroid CTE (the seed `c` table for [[ivfChainSql]], the
    * trained `c3` table for the trained-IVF oracles) — the SQL twin
    * of [[ivfCandidatesWith]]. Expects `v (vec_id, e)` in scope. */
  private def ivfProbeChainSql(cent: String, nq: Int): String =
    s"""s AS (SELECT v.vec_id, c.cid,
       |    round(${cosSql("v.e", "c.ce")}, 6) AS csim
       |  FROM v CROSS JOIN $cent c),
       |asg AS (SELECT vec_id, cid AS cell FROM (
       |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY csim DESC, cid) AS r FROM s) WHERE r = 1),
       |probes AS (SELECT vec_id AS query_id, cid AS pcell FROM (
       |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY csim DESC, cid) AS r FROM s
       |  WHERE vec_id < $nq) WHERE r <= $ivfProbes),
       |cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
       |  FROM probes p JOIN asg a ON a.cell = p.pcell
       |  WHERE a.vec_id <> p.query_id)""".stripMargin

  /** Oracle for ann_ivf_trained_topk: the 3-round Lloyd chain, then
    * the probe chain against the trained `c3` table, then the exact
    * verify tail — ann_ivf_topk with training spliced in. */
  private lazy val ivfTrainedTopkOracleSql: String =
    lloydCtesSql(3) + ",\n" + ivfProbeChainSql("c3", queryCount) +
      s"""
      |SELECT cand.query_id,
      |  CAST(row_number() OVER (PARTITION BY cand.query_id
      |    ORDER BY round(${cosSql("q.e", "n.e")}, 6) DESC,
      |      cand.neighbor_id) AS INT) AS rank,
      |  cand.neighbor_id,
      |  round(${cosSql("q.e", "n.e")}, 6) AS sim
      |FROM cand JOIN v q ON q.vec_id = cand.query_id
      |  JOIN v n ON n.vec_id = cand.neighbor_id
      |QUALIFY rank <= $ivfTopK
      |ORDER BY query_id, rank""".stripMargin

  /** Oracle for ann_ivf_trained_recall: the same trained chain folded
    * against the exact panel (ann_recall's measurement). */
  private lazy val ivfTrainedRecallOracleSql: String =
    lloydCtesSql(3) + ",\n" + ivfProbeChainSql("c3", queryCount) +
      s""",
      |iv AS (SELECT query_id, neighbor_id FROM (
      |  SELECT cand.query_id, cand.neighbor_id,
      |    row_number() OVER (PARTITION BY cand.query_id
      |      ORDER BY round(${cosSql("q.e", "n.e")}, 6) DESC,
      |        cand.neighbor_id) AS rank
      |  FROM cand JOIN v q ON q.vec_id = cand.query_id
      |    JOIN v n ON n.vec_id = cand.neighbor_id)
      |  WHERE rank <= $ivfTopK),
      |ex AS (SELECT query_id, neighbor_id FROM (
      |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
      |    row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY round(${cosSql("q.e", "n.e")}, 6) DESC, n.vec_id) AS rank
      |  FROM v q JOIN v n ON q.vec_id < $queryCount AND q.vec_id <> n.vec_id)
      |  WHERE rank <= 5)
      |SELECT ex.query_id, count(*) AS n_exact,
      |  count(iv.neighbor_id) AS n_hit,
      |  round(count(iv.neighbor_id) / count(*), 6) AS recall
      |FROM ex LEFT JOIN iv ON iv.query_id = ex.query_id
      |  AND iv.neighbor_id = ex.neighbor_id
      |GROUP BY ex.query_id ORDER BY ex.query_id""".stripMargin

  /** Int8 scoring + top-k over an arbitrary (query_id, neighbor_id)
    * candidate set — the serving tail of the IVF+SQ8 stack, shared by
    * the batch ann_ivf_quantized_topk and the streamed s44 twin
    * (which generates candidates from the LIVE streamed cell
    * memberships instead of the batch assignment). */
  private[queries] def quantScoredTopk(spark: SparkSession, dir: String,
                                       cand: DataFrame): DataFrame = {
    val qv = quantized(spark, dir)
    val q = qv.select(col("vec_id").as("query_id"),
      col("q").as("qe"), col("qn").as("qqn"))
    val n = qv.select(col("vec_id").as("neighbor_id"),
      col("q").as("ne"), col("qn").as("nqn"))
    val scored = cand.join(q, "query_id").join(n, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        safeCosine(VectorFunctions.dot(col("qe"), col("ne")),
          col("qqn"), col("nqn")).as("qsim"))
    topkTail(scored, ivfTopK, "qsim", desc = true)
  }

  /** Probe-side candidate generation against a SUPPLIED cell
    * membership table (vec_id, cell) — the query path of a live ANN
    * service: score the query panel against the broadcast centroids,
    * keep the nprobe best cells, and fetch each probed cell's members
    * from the index. Identical probe order/tiebreak to
    * [[ivfCandidates]]; only the membership source differs. */
  private[queries] def ivfCandidatesFrom(spark: SparkSession, dir: String,
                                         asg: DataFrame): DataFrame = {
    val base = emb(spark, dir)
    val cent = base.filter(col("vec_id") < ivfCells)
      .select(col("vec_id").as("cid"), col("e").as("ce"),
        col("nrm").as("cn"))
    // same mergeable top-k probe selection as [[ivfCandidatesOn]]
    val probes = topkTail(
        base.filter(col("vec_id") < queryCount)
          .crossJoin(broadcast(cent))
          .select(col("vec_id").as("query_id"),
            col("cid").as("neighbor_id"),
            round(VectorFunctions.dot(col("e"), col("ce")) /
              (col("nrm") * col("cn")), 6).as("csim")),
        ivfProbes, "csim", desc = true)
      .select(col("query_id"), col("neighbor_id").as("pcell"))
    probes.join(asg, col("pcell") === col("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
  }

  /** The IVF+SQ8 top-k oracle — shared by ann_ivf_quantized_topk and
    * its streamed serving twin s44 (whose converged index must answer
    * the same queries identically). */
  private[queries] def ivfQuantTopkOracleSql: String =
    s"""WITH $ivfCteSql,
       |$quantTailCteSql
       |SELECT cand.query_id,
       |  CAST(row_number() OVER (PARTITION BY cand.query_id
       |    ORDER BY ${quantSimSql("q", "n")} DESC,
       |      cand.neighbor_id) AS INT) AS rank,
       |  cand.neighbor_id,
       |  ${quantSimSql("q", "n")} AS qsim
       |FROM cand JOIN qq q ON q.vec_id = cand.query_id
       |  JOIN qq n ON n.vec_id = cand.neighbor_id
       |QUALIFY rank <= $ivfTopK
       |ORDER BY query_id, rank""".stripMargin

  /** Int8 symmetric scalar quantization of the corpus: per vector a
    * scale s = max|x|/[[qLevels]], components floor(x/s + 0.5), plus
    * the integer norm. Every value is an exact small integer (≤ 127)
    * held in a double, so sums are order-independent and the DuckDB
    * twin is bitwise-identical. The all-zero-vector edge (s = 0)
    * quantizes to the zero vector instead of dividing by zero. */
  private def quantized(spark: SparkSession, dir: String): DataFrame =
    Registry.table(spark, dir, "embeddings")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("s", array_max(transform(col("e"), x => abs(x))) / qLevels)
      .select(col("vec_id"),
        when(col("s") === 0d, transform(col("e"), _ => lit(0d)))
          .otherwise(transform(col("e"),
            x => floor(x / col("s") + lit(0.5)))).as("q"))
      .withColumn("qn", VectorFunctions.norm(col("q")))

  /** Quantized-cosine top-5 for the fixed query panel — the int8 twin
    * of [[bruteTopkPairs]] (same allow-listed tiny-broadcast BNLJ:
    * [[queryCount]] query vectors against the corpus). Shared by
    * ann_quantized_topk and ann_quantized_recall. */
  private def quantTopkPairs(spark: SparkSession, dir: String): DataFrame = {
    val qv = quantized(spark, dir)
    val q = qv.filter(col("vec_id") < queryCount)
      .select(col("vec_id").as("query_id"), col("q").as("qe"),
        col("qn").as("qqn"))
    val n = qv.select(col("vec_id").as("neighbor_id"), col("q").as("ne"),
      col("qn").as("nqn"))
    val scored = broadcast(q).join(n, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        safeCosine(VectorFunctions.dot(col("qe"), col("ne")),
          col("qqn"), col("nqn")).as("qsim"))
    topkTail(scored, 5, "qsim", desc = true)
  }

  /** The quantized-corpus CTE tail (per-vector scale → int8
    * components + integer norm), assuming a `v AS (...)` corpus CTE
    * is already in scope — so it composes with [[ivfCteSql]] (which
    * defines its own `v`) as well as standing alone. */
  private def quantTailCteSql: String =
    s"""sc AS (SELECT vec_id, e,
       |    list_max(list_transform(e, x -> abs(x))) / $qLevels AS s FROM v),
       |qq AS (SELECT vec_id, e, q, sqrt(list_inner_product(q, q)) AS qn
       |  FROM (SELECT vec_id, e,
       |    CASE WHEN s = 0 THEN list_transform(e, x -> 0.0)
       |         ELSE list_transform(e, x -> floor(x / s + 0.5)) END AS q
       |  FROM sc))""".stripMargin

  /** The quantized corpus as CTEs (v → per-vector scale → int8
    * components + integer norm) — shared by the ann_quantized_topk
    * and ann_quantized_recall oracles. */
  private def quantCteSql: String =
    s"""v AS ($embSql),
       |$quantTailCteSql""".stripMargin

  /** The grid transform (see [[pqGrid]]): every component an exact
    * small integer held in a double. */
  private def toGrid(e: Column): Column =
    transform(e, x => floor(x * pqGrid + lit(0.5)).cast("double"))

  /** Embeddings on the fixed integer grid. */
  private def gridded(spark: SparkSession, dir: String): DataFrame =
    Registry.table(spark, dir, "embeddings")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id"),
        toGrid(col("embedding").cast("array<double>")).as("g"))

  /** Fan a (vec_id, g) grid frame out to its subvector slices
    * (vec_id, s, xs) — the 8-row subspace table is a fixed broadcast. */
  private def subSlices(spark: SparkSession, gv: DataFrame): DataFrame = {
    val subs = broadcast(
      spark.range(pqSubspaces).select(col("id").cast("int").as("s")))
    gv.crossJoin(subs)
      .select(col("vec_id"), col("s"),
        slice(col("g"), col("s") * pqSubDim + 1, lit(pqSubDim)).as("xs"))
  }

  /** The PQ codebook (s, cid, cs): subvector slices of the first
    * [[pqCentroids]] corpus vectors — the deterministic seed shared
    * with the IVF coarse quantizer. 128 rows, always broadcast.
    * Shared with StreamingOps (s46): the streamed encoder must code
    * against exactly this table. */
  private[queries] def pqCodebook(spark: SparkSession, dir: String): DataFrame =
    subSlices(spark, gridded(spark, dir).filter(col("vec_id") < pqCentroids))
      .select(col("s").as("cb_s"), col("vec_id").as("cid"),
        col("xs").as("cs"))

  /** d2 = ‖xs‖² − 2·xs·cs + ‖cs‖², exact integer arithmetic on the
    * grid in both engines. */
  private def pqD2(xs: Column, cs: Column): Column =
    VectorFunctions.dot(xs, xs) - lit(2d) * VectorFunctions.dot(xs, cs) +
      VectorFunctions.dot(cs, cs)

  /** (vec_id, s, cid, d2) — the full per-subspace distance matrix of
    * the corpus against the PQ codebook. No query path materializes
    * this anymore (encoding is scan-local via [[codesWithSlices]] and
    * the ADC tail builds its panel table via [[queryDist]]); retained
    * for the PqPcaSpec invariants, which assert over the explicit
    * matrix. */
  private[queries] def pqDist(spark: SparkSession, dir: String): DataFrame =
    subSlices(spark, gridded(spark, dir))
      .join(broadcast(pqCodebook(spark, dir)), col("s") === col("cb_s"))
      .select(col("vec_id"), col("s"), col("cid"),
        pqD2(col("xs"), col("cs")).as("d2"))
      .localCheckpoint()

  /** PQ encoding: per (vector, subspace) the argmin-d2 centroid id,
    * ties to the lower cid (matches the oracle's ORDER BY d2, cid).
    * These 4-bit codes ARE the stored corpus at 100 TB. (Retained for
    * the PqPcaSpec invariants; the query paths encode scan-locally via
    * [[codesWithSlices]] — same argmin, no distance-matrix exchange.) */
  private[queries] def pqCodes(dist: DataFrame): DataFrame =
    dist.groupBy(col("vec_id"), col("s"))
      .agg(max_by(col("cid"), struct(-col("d2"), -col("cid")))
        .as("code"))

  /** A codebook rolled to ONE array row per subspace (cb_s, cents
    * sorted by cid) — the 8-row broadcast that makes code assignment
    * scan-local. ‖cs‖² is hoisted per centroid here (computed once per
    * codebook, not once per (row, centroid) in the interpreted argmin
    * lambda — higher-order lambdas don't codegen, so per-element work
    * must be minimal). */
  private def cbArr(cb: DataFrame): DataFrame =
    cb.groupBy(col("cb_s"))
      .agg(sort_array(collect_list(struct(col("cid"), col("cs"),
        VectorFunctions.dot(col("cs"), col("cs")).as("cc"))))
        .as("cents"))

  /** SCAN-LOCAL code assignment carrying the subvector through:
    * (vec_id, s, xs, code). The former shape fanned every (vector,
    * subspace) slice out to one row per codebook centroid through the
    * distance join, materialized that n×(subspaces·centroids) matrix
    * (pqDist's localCheckpoint), and funneled the argmin back through
    * a groupBy(vec_id, s) exchange; the argmin now runs per ROW
    * against the 8-row broadcast codebook-array table, so encoding
    * plans with NO exchange and no distance-matrix materialization at
    * all — the assignFull/Lloyd E-step fusion (guide §2.4) applied to
    * the PQ rung. Arithmetic and tie-break are bit-identical to
    * pqCodes∘pqDist / pqCodes∘pqTrainedDist: the same exact-integer
    * grid d2 per (slice, centroid) — ‖xs‖² hoisted once per slice —
    * with quantize=true applying pqTrainedDist's identical scan-local
    * floor(d2·10⁶ + 0.5); the winner is the lexicographic struct max
    * over (−d2, −cid) = the former max_by(cid, struct(−d2, −cid)),
    * unique because cid is. */
  private def codesWithSlices(slices: DataFrame, cb: DataFrame,
                              quantize: Boolean): DataFrame =
    slices.join(broadcast(cbArr(cb)), col("s") === col("cb_s"))
      .withColumn("xx", VectorFunctions.dot(col("xs"), col("xs")))
      .select(col("vec_id"), col("s"), col("xs"),
        (-array_max(transform(col("cents"), c => {
          val d2 = col("xx") -
            lit(2d) * VectorFunctions.dot(col("xs"), c.getField("cs")) +
            c.getField("cc")
          val d = if (quantize) floor(d2 * lit(1000000d) + lit(0.5))
                  else d2
          struct((-d).as("nd"), (-c.getField("cid")).as("ncid"))
        })).getField("ncid")).as("code"))

  /** The query PANEL's per-(subspace, centroid) distance table — the
    * broadcast side of the ADC tail, built by restricting to the
    * panel BEFORE the codebook fan-out (queryCount×subspaces×centroids
    * rows; the former path projected it out of the full n×1024
    * matrix). Same d2 arithmetic as pqDist, with quantize=true the
    * same scan-local micro-quantization as pqTrainedDist. */
  private def queryDist(spark: SparkSession, dir: String, cb: DataFrame,
                        quantize: Boolean): DataFrame =
    subSlices(spark, gridded(spark, dir).filter(col("vec_id") < queryCount))
      .join(broadcast(cb), col("s") === col("cb_s"))
      .select(col("vec_id"), col("s"), col("cid"), {
        val d2 = pqD2(col("xs"), col("cs"))
        (if (quantize) floor(d2 * lit(1000000d) + lit(0.5)) else d2)
          .as("d2")
      })

  /** Encode arbitrary (vec_id, e) vector rows against a supplied
    * codebook → (vec_id, s, code). Shared with StreamingOps (s46):
    * the per-microbatch incremental encoder — identical arithmetic
    * and tie-break to the batch index build. */
  private[queries] def pqEncode(spark: SparkSession, vecs: DataFrame,
                                cb: DataFrame): DataFrame =
    codesWithSlices(
      subSlices(spark, vecs.select(col("vec_id"), toGrid(col("e")).as("g"))),
      cb, quantize = false)
      .select(col("vec_id"), col("s"), col("code"))

  /** ADC scoring tail shared by the all-pairs, IVF-candidate and
    * streamed-serving variants: join the SUPPLIED codes to the
    * broadcast query distance table on (s, code) and sum the 8
    * lookups — integer-exact, so the BIGINT cast loses nothing. */
  private def pqAdcRanked(dist: DataFrame, codes: DataFrame,
                          pairsFilter: DataFrame => DataFrame,
                          topK: Int): DataFrame = {
    val dt = dist.filter(col("vec_id") < queryCount)
      .select(col("vec_id").as("query_id"), col("s").as("dt_s"),
        col("cid"), col("d2"))
    val scored = codes.join(broadcast(dt),
        col("s") === col("dt_s") && col("code") === col("cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("d2")).cast("long").as("adc"))
      .withColumnRenamed("vec_id", "neighbor_id")
    topkTail(pairsFilter(scored), topK, "adc", desc = false,
      outType = "long")
  }

  /** PQ-ADC top-5 of the query panel against the whole coded corpus. */
  private def pqAdcTopk(spark: SparkSession, dir: String): DataFrame = {
    val cb = pqCodebook(spark, dir)
    pqAdcRanked(queryDist(spark, dir, cb, quantize = false),
      codesWithSlices(subSlices(spark, gridded(spark, dir)), cb,
        quantize = false),
      identity, 5)
  }

  /** PQ-ADC top-k restricted to supplied (query_id, neighbor_id)
    * candidates — the IVF+PQ serving tail. */
  private def pqAdcScoredTopk(spark: SparkSession, dir: String,
                              cand: DataFrame): DataFrame = {
    val cb = pqCodebook(spark, dir)
    pqAdcRanked(queryDist(spark, dir, cb, quantize = false),
      codesWithSlices(subSlices(spark, gridded(spark, dir)), cb,
        quantize = false),
      _.join(cand, Seq("query_id", "neighbor_id"), "leftsemi"), ivfTopK)
  }

  /** PQ-ADC top-5 served from a SUPPLIED codes table — the streamed
    * serving tail (s46): the live streamed code state answers the
    * standing query panel through the exact batch read path. */
  private[queries] def pqAdcServe(spark: SparkSession, dir: String,
                                  codes: DataFrame): DataFrame =
    pqAdcRanked(
      queryDist(spark, dir, pqCodebook(spark, dir), quantize = false),
      codes, identity, 5)

  /** Exact grid-L2 top-5 for the query panel (the ground truth ADC
    * approximates) — the same allow-listed tiny-broadcast BNLJ shape
    * as [[bruteTopkPairs]]. */
  private def gridL2TopkPairs(spark: SparkSession, dir: String): DataFrame = {
    val gv = gridded(spark, dir)
    val q = gv.filter(col("vec_id") < queryCount)
      .select(col("vec_id").as("query_id"), col("g").as("qg"))
    val n = gv.select(col("vec_id").as("neighbor_id"), col("g").as("ng"))
    val scored = broadcast(q).join(n, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (VectorFunctions.dot(col("qg"), col("qg"))
          - lit(2d) * VectorFunctions.dot(col("qg"), col("ng"))
          + VectorFunctions.dot(col("ng"), col("ng"))).as("l2"))
    topkTail(scored, 5, "l2", desc = false)
  }

  /** The PQ CTE tail (grid corpus → subspace slices → codebook →
    * distance matrix → codes), assuming `v AS (...)` in scope — so it
    * composes with [[ivfCteSql]] as well as standing alone via
    * [[pqCteSql]]. Mirrors the Spark chain in [[pqDist]]/[[pqCodes]]
    * op for op. */
  private def pqTailCteSql: String =
    s"""gv AS (SELECT vec_id,
       |    list_transform(e, x -> CAST(floor(x * $pqGrid + 0.5) AS DOUBLE))
       |      AS g FROM v),
       |sub AS (SELECT CAST(s AS INT) AS s
       |  FROM generate_series(0, ${pqSubspaces - 1}) t(s)),
       |sv AS (SELECT gv.vec_id, sub.s,
       |    gv.g[sub.s * $pqSubDim + 1 : sub.s * $pqSubDim + $pqSubDim] AS xs
       |  FROM gv CROSS JOIN sub),
       |pqd AS (SELECT sv.vec_id, sv.s, cb.cid,
       |    list_inner_product(sv.xs, sv.xs)
       |      - 2 * list_inner_product(sv.xs, cb.cs)
       |      + list_inner_product(cb.cs, cb.cs) AS d2
       |  FROM sv JOIN (SELECT s, vec_id AS cid, xs AS cs FROM sv
       |    WHERE vec_id < $pqCentroids) cb ON sv.s = cb.s),
       |pqc AS (SELECT vec_id, s, cid AS code FROM (
       |  SELECT vec_id, s, cid, row_number() OVER (
       |    PARTITION BY vec_id, s ORDER BY d2, cid) AS r
       |  FROM pqd) WHERE r = 1)""".stripMargin

  /** The standalone PQ CTE chain — shared by the ann_pq_topk and
    * ann_pq_recall oracles. */
  private def pqCteSql: String =
    s"""v AS ($embSql),
       |$pqTailCteSql""".stripMargin

  /** The TRAINED-codebook CTE chain (assumes the [[pqTailCteSql]]
    * names in scope): M-step means as exact integer ratios, refined
    * distances micro-quantized, re-encoded codes — mirrors
    * [[pqTrainedCodebook]]/[[pqTrainedDist]] op for op. */
  private def pqTrainedTailCteSql: String =
    s"""cbk AS (SELECT s, vec_id AS cid, xs AS cs FROM sv
       |  WHERE vec_id < $pqCentroids),
       |mv AS (SELECT sv.s, a.code, i AS pos, sv.xs[i] AS v
       |  FROM sv JOIN pqc a ON a.vec_id = sv.vec_id AND a.s = sv.s,
       |  unnest(generate_series(1, $pqSubDim)) g(i)),
       |mn AS (SELECT s, code, pos,
       |    CAST(sum(v) AS BIGINT) / count(*) AS c
       |  FROM mv GROUP BY s, code, pos),
       |cb1 AS (SELECT s, code AS cid, list(c ORDER BY pos) AS cs1
       |  FROM mn GROUP BY s, code),
       |cbt AS (SELECT cbk.s, cbk.cid, coalesce(cb1.cs1, cbk.cs) AS cs
       |  FROM cbk LEFT JOIN cb1 ON cb1.s = cbk.s AND cb1.cid = cbk.cid),
       |pqdt AS (SELECT sv.vec_id, sv.s, cbt.cid,
       |    floor((list_inner_product(sv.xs, sv.xs)
       |      - 2 * list_inner_product(sv.xs, cbt.cs)
       |      + list_inner_product(cbt.cs, cbt.cs)) * 1000000 + 0.5) AS dm
       |  FROM sv JOIN cbt ON sv.s = cbt.s),
       |pqct AS (SELECT vec_id, s, cid AS code FROM (
       |  SELECT vec_id, s, cid, row_number() OVER (
       |    PARTITION BY vec_id, s ORDER BY dm, cid) AS r
       |  FROM pqdt) WHERE r = 1)""".stripMargin

  /** The trained-PQ ADC top-5 oracle. */
  private def pqTrainedTopkOracleSql: String =
    s"""WITH $pqCteSql,
       |$pqTrainedTailCteSql,
       |adct AS (SELECT dt.vec_id AS query_id, co.vec_id AS neighbor_id,
       |    CAST(sum(dt.dm) AS BIGINT) AS adc
       |  FROM pqct co JOIN pqdt dt ON dt.s = co.s AND dt.cid = co.code
       |  WHERE dt.vec_id < $queryCount AND dt.vec_id <> co.vec_id
       |  GROUP BY dt.vec_id, co.vec_id)
       |SELECT query_id,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY adc, neighbor_id) AS INT) AS rank,
       |  neighbor_id, adc
       |FROM adct QUALIFY rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** One Lloyd refinement of the PQ codebook: per (subspace, code)
    * the element-wise mean of the assigned subvectors — k-means'
    * M-step run once per subspace, which is exactly how FAISS trains
    * PQ codebooks (iterated). Grid components are exact integers, so
    * each mean is the exact rational S/n computed identically in both
    * engines — NO rounding needed on centroids at all. A code that
    * captured no members keeps its seed subvector (can't happen here
    * — every seed centroid IS a corpus subvector and assigns to
    * itself at d2 = 0 — but the coalesce keeps the operator total). */
  private def pqTrainedCodebook(spark: SparkSession, dir: String): DataFrame = {
    // scan-local encoding carries xs through, so the former
    // xs⋈codes(vec_id, s) M-step re-attach join (and the n×1024
    // distance matrix feeding it) disappears — the lloyd/statMeans
    // fusion applied per subspace
    val means = codesWithSlices(subSlices(spark, gridded(spark, dir)),
        pqCodebook(spark, dir), quantize = false)
      .select(col("s"), col("code"), posexplode(col("xs")).as(Seq("pos", "v")))
      .groupBy(col("s"), col("code"), col("pos"))
      .agg((sum(col("v")).cast("long") / count(lit(1))).as("c"))
      .groupBy(col("s"), col("code"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("s").as("m_s"), col("code"),
        expr("transform(pc, x -> x.c)").as("cs1"))
    pqCodebook(spark, dir)
      .join(means, col("cb_s") === col("m_s") && col("cid") === col("code"),
        "left")
      .select(col("cb_s"), col("cid"),
        coalesce(col("cs1"), col("cs")).as("cs"))
  }

  /** Distances to the TRAINED codebook, micro-quantized scan-locally
    * (floor(d2·10⁶ + 0.5) — trained centroids are rationals, so the
    * raw d2 is no longer integer; the fixed-point grid restores
    * order-independent exact ADC sums and a tie-stable argmin). */
  private[queries] def pqTrainedDist(spark: SparkSession, dir: String): DataFrame =
    subSlices(spark, gridded(spark, dir))
      .join(broadcast(pqTrainedCodebook(spark, dir)),
        col("s") === col("cb_s"))
      .select(col("vec_id"), col("s"), col("cid"),
        floor(pqD2(col("xs"), col("cs")) * lit(1000000d) + lit(0.5))
          .as("d2"))
      .localCheckpoint()

  /** M = Σ x·xᵀ over the grid corpus, held as 64 array rows (i, mi)
    * with exact-integer entries (xi·xj ≤ 10⁶, summed over the corpus
    * — far inside double-exact integer range). The ONE data-sized
    * aggregation of the PCA pipeline: a slim (i, j) partial-agg
    * shuffle; everything after runs on this 64×64 broadcast. */
  /** (i, j, m) moment entries → 64 ordered array rows (i, mi) —
    * shared by the batch build and the streamed-state readback
    * (s47), whose converged entries must produce the same arrays. */
  private[queries] def momentArrays(entries: DataFrame): DataFrame =
    entries
      .groupBy(col("i"))
      .agg(array_sort(collect_list(struct(col("j"), col("m")))).as("jm"))
      .select(col("i"), expr("transform(jm, x -> CAST(x.m AS DOUBLE))")
        .as("mi"))

  /** The grid transform surfaced for the streaming twin (s47): the
    * incremental moment accumulation must grid identically. */
  private[queries] def gridOf(e: Column): Column = toGrid(e)

  /** The 64×64 moment matrix Σ x·xᵀ, built SCAN-LOCALLY: each gridded
    * vector fans out to its (i, j, xi·xj) outer-product cells inside
    * the scan (two chained posexplodes — no join, so no data-sized
    * shuffle anywhere in the PCA pipeline), and the only exchange is
    * the partial-aggregated 4,096 fixed (i, j) groups. This is
    * exactly the fan-out s47's streaming twin runs per microbatch, so
    * batch and streamed moments accumulate through the identical
    * arithmetic. (The previous shape self-joined two posexploded
    * copies on vec_id — linear too, but it shuffled 2×(n·64) slim
    * rows first; PqPcaSpec pins the join-free plan.) */
  private[queries] def momentMatrix(spark: SparkSession, dir: String): DataFrame =
    momentArrays(
      gridded(spark, dir)
        .select(col("g"), posexplode(col("g")).as(Seq("i", "xi")))
        .select(col("i"), col("xi"), posexplode(col("g")).as(Seq("j", "xj")))
        .groupBy(col("i"), col("j"))
        .agg(sum(col("xi") * col("xj")).cast("long").as("m")))

  /** `iters` power-iteration rounds y ← normalize(M·y) from the
    * all-ones seed, each step 64 SEQUENTIAL dots against the 1-row
    * broadcast y (no groupBy float sum anywhere — the whole
    * cross-engine hazard surface is avoided by construction); final
    * components micro-quantized half-up, Rayleigh quotient yᵀMy as
    * the dominant-eigenvalue estimate. */
  /** The power loop from a SUPPLIED (already checkpointed) moment
    * matrix: (M, final unit direction y) — shared by the batch
    * training/application rows and the streamed-moment twin s47. */
  private[queries] def pcaIterateFrom(spark: SparkSession, m: DataFrame,
                                      iters: Int): (DataFrame, DataFrame) = {
    var y = spark.range(1)
      .select(expr(s"transform(sequence(1, $dims), p -> CAST(1.0 AS DOUBLE))")
        .as("y"))
    for (_ <- 1 to iters) {
      val comps = m.crossJoin(broadcast(y))
        .select(col("i"), VectorFunctions.dot(col("mi"), col("y")).as("c"))
      y = comps.groupBy()
        .agg(array_sort(collect_list(struct(col("i"), col("c")))).as("ic"))
        .select(expr("transform(ic, x -> x.c)").as("raw"))
        .withColumn("n", VectorFunctions.norm(col("raw")))
        .select(transform(col("raw"), v => v / col("n")).as("y"))
        .localCheckpoint()
    }
    (m, y)
  }

  /** The learned unit direction alone (the application rows' input). */
  private def pcaDirection(spark: SparkSession, dir: String,
                           iters: Int): DataFrame =
    pcaIterateFrom(spark, momentMatrix(spark, dir).localCheckpoint(),
      iters)._2

  /** Power training output (pos, comp, rayleigh) from a SUPPLIED
    * moment matrix — the tail shared by v_pca_power3 and s47 (the
    * streamed moment state must answer identically). */
  private[queries] def pcaPowerFromMoment(spark: SparkSession, m0: DataFrame,
                                          iters: Int): DataFrame = {
    val (m, y) = pcaIterateFrom(spark, m0, iters)
    val mya = m.crossJoin(broadcast(y))
      .select(col("i"), VectorFunctions.dot(col("mi"), col("y")).as("c"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("i"), col("c")))).as("ic"))
      .select(expr("transform(ic, x -> x.c)").as("myv"))
    y.crossJoin(broadcast(mya))
      .select(col("y"), col("myv"), posexplode(col("y")).as(Seq("p0", "cr")))
      .select((col("p0") + 1).cast("int").as("pos"),
        (floor(col("cr") * lit(1000000d) + lit(0.5)) / lit(1000000d))
          .as("comp"),
        floor(VectorFunctions.dot(col("y"), col("myv")) + lit(0.5))
          .cast("long").as("rayleigh"))
      .orderBy(col("pos"))
  }

  private def pcaPowerQuery(spark: SparkSession, dir: String,
                            iters: Int): DataFrame =
    pcaPowerFromMoment(spark, momentMatrix(spark, dir).localCheckpoint(),
      iters)

  /** The WITH chain through the final unit direction y{iters} —
    * shared by the training and application oracles (the
    * v_kmeans_lloyd3 unrolled-oracle trick applied to
    * eigen-iteration: ordered list rebuilds, sequential inner
    * products, the same final micro-quantization). */
  private def pcaChainCteSql(iters: Int): String = {
    val sb = new StringBuilder(
      s"""WITH v AS ($embSql),
         |gv AS (SELECT vec_id,
         |    list_transform(e, x -> CAST(floor(x * $pqGrid + 0.5) AS DOUBLE))
         |      AS g FROM v),
         |el AS (SELECT vec_id, i, g[i] AS xi
         |  FROM gv, unnest(generate_series(1, $dims)) t(i)),
         |mm AS (SELECT a.i, b.i AS j, CAST(sum(a.xi * b.xi) AS BIGINT) AS m
         |  FROM el a JOIN el b ON a.vec_id = b.vec_id GROUP BY 1, 2),
         |mr AS (SELECT i, list(CAST(m AS DOUBLE) ORDER BY j) AS mi
         |  FROM mm GROUP BY i),
         |y0 AS (SELECT list_transform(generate_series(1, $dims), p -> 1.0)
         |  AS y)""".stripMargin)
    for (r <- 1 to iters) sb.append(s""",
      |r$r AS (SELECT mr.i, list_inner_product(mr.mi, y${r - 1}.y) AS c
      |  FROM mr, y${r - 1}),
      |a$r AS (SELECT list(c ORDER BY i) AS raw FROM r$r),
      |y$r AS (SELECT list_transform(raw,
      |    v -> v / sqrt(list_inner_product(raw, raw))) AS y FROM a$r)""".stripMargin)
    sb.toString
  }

  /** Shared with StreamingOps (s47): the streamed moment state's
    * power output must hash-match exactly this. */
  private[queries] def pcaPowerOracleSql(iters: Int): String = {
    val sb = new StringBuilder(pcaChainCteSql(iters))
    sb.append(s""",
      |my AS (SELECT mr.i, list_inner_product(mr.mi, y$iters.y) AS c
      |  FROM mr, y$iters),
      |mya AS (SELECT list(c ORDER BY i) AS myv FROM my)
      |SELECT CAST(p AS INT) AS pos,
      |  floor(y$iters.y[p] * 1000000 + 0.5) / 1000000 AS comp,
      |  CAST(floor(list_inner_product(y$iters.y, mya.myv) + 0.5) AS BIGINT)
      |    AS rayleigh
      |FROM y$iters, mya, unnest(generate_series(1, $dims)) t(p)
      |ORDER BY pos""".stripMargin)
    sb.toString
  }

  /** The PQ-ADC top-5 oracle — shared by ann_pq_topk and its streamed
    * serving twin s46 (whose converged code state must answer the
    * same queries identically). */
  private[queries] def pqTopkOracleSql: String =
    s"""WITH $pqCteSql,
       |adc AS (SELECT dt.vec_id AS query_id, co.vec_id AS neighbor_id,
       |    CAST(sum(dt.d2) AS BIGINT) AS adc
       |  FROM pqc co JOIN pqd dt ON dt.s = co.s AND dt.cid = co.code
       |  WHERE dt.vec_id < $queryCount AND dt.vec_id <> co.vec_id
       |  GROUP BY dt.vec_id, co.vec_id)
       |SELECT query_id,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY adc, neighbor_id) AS INT) AS rank,
       |  neighbor_id, adc
       |FROM adc QUALIFY rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** Cosine with a zero-norm guard, rounded to 6: an all-zero
    * embedding quantizes/projects to the zero vector, and 0/0 is NaN
    * in Spark but NULL in DuckDB — a cross-engine divergence. Emit
    * NULL in both engines (Spark desc and DuckDB DESC both sort NULLS
    * LAST, so ranking agrees too). Latent-only today: the corpus has
    * no zero vectors. */
  private def safeCosine(dot: Column, n1: Column, n2: Column): Column =
    when(n1 * n2 === 0, lit(null).cast("double"))
      .otherwise(round(dot / (n1 * n2), 6))

  /** Quantized cosine between two `qq` rows (rounded to 6, like
    * [[cosSql]]); the CASE mirrors [[safeCosine]]'s zero-norm NULL
    * explicitly (DuckDB's x/0 is NULL anyway, but keep it spelled). */
  private def quantSimSql(a: String, b: String): String =
    s"CASE WHEN $a.qn * $b.qn = 0 THEN NULL ELSE " +
      s"round(list_inner_product($a.q, $b.q) / ($a.qn * $b.qn), 6) END"

  /** The JL-projected corpus: per vector the 16 unrounded plane dots
    * (scaled like v_random_project) plus the projected norm. Each
    * component is the same sequential dot in both engines, so the
    * projected cosines hash-match exactly. */
  private def projected(spark: SparkSession, dir: String): DataFrame = {
    val comps = (0 until rpDims).map { p =>
      val plane = array(VectorFunctions.planeComponents(p, dims)
        .map(c => lit(c.toDouble)): _*)
      VectorFunctions.dot(col("e"), plane) / 4000
    }
    emb(spark, dir)
      .select(col("vec_id"), array(comps: _*).as("p"))
      .withColumn("pn", VectorFunctions.norm(col("p")))
  }

  /** Projected-cosine top-5 for the fixed query panel — the JL twin
    * of [[bruteTopkPairs]] / [[quantTopkPairs]] (same allow-listed
    * tiny-broadcast BNLJ). */
  private def rpTopkPairs(spark: SparkSession, dir: String): DataFrame = {
    val pv = projected(spark, dir)
    val q = pv.filter(col("vec_id") < queryCount)
      .select(col("vec_id").as("query_id"), col("p").as("qp"),
        col("pn").as("qpn"))
    val n = pv.select(col("vec_id").as("neighbor_id"), col("p").as("np"),
      col("pn").as("npn"))
    val scored = broadcast(q).join(n, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        safeCosine(VectorFunctions.dot(col("qp"), col("np")),
          col("qpn"), col("npn")).as("psim"))
    topkTail(scored, 5, "psim", desc = true)
  }

  /** The projected-corpus CTE tail (16 plane dots + projected norm),
    * assuming `v AS (...)` in scope — mirrors [[quantTailCteSql]]. */
  private def rpTailCteSql: String = {
    val comps = (0 until rpDims).map(p =>
      s"list_inner_product(e, ${planeSql(p)}) / 4000")
      .mkString("[", ",\n    ", "]")
    s"""pq AS (SELECT vec_id, p, sqrt(list_inner_product(p, p)) AS pn
       |  FROM (SELECT vec_id,
       |    $comps AS p
       |  FROM v))""".stripMargin
  }

  /** Projected cosine between two `pq` rows (rounded to 6); zero-norm
    * guard as in [[quantSimSql]]. */
  private def rpSimSql(a: String, b: String): String =
    s"CASE WHEN $a.pn * $b.pn = 0 THEN NULL ELSE " +
      s"round(list_inner_product($a.p, $b.p) / ($a.pn * $b.pn), 6) END"
}
