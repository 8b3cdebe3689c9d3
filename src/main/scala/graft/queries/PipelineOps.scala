package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions

/** The END-TO-END curation pipeline as ONE declarative plan — the DAG
  * a training-data run actually executes, composed from stages that
  * are each individually driver-verified elsewhere:
  *
  *   quality gate (t_quality) → exact dedup (dedup_exact/canonical) →
  *   semantic dedup (dedup_semantic) → split manifest (t_sample_split)
  *
  * The output is the curated-corpus MANIFEST: one row per admitted
  * document with its language, train/val/test split, quality score and
  * semantic cell. Because the whole pipeline is one Catalyst plan,
  * stages fuse where they can (quality, fingerprint and split bucket
  * are all computed in the single documents scan; the quality filter
  * prunes before any shuffle) — the composition costs one
  * fingerprint-window shuffle, one slim id-keyed join to the cell
  * assignment, and the per-cell survivor self-join, nothing more. At
  * 100 TB each stage's scale story is unchanged from its standalone
  * row; composing them ADDS no shuffle over running them separately
  * and saves the inter-stage materializations.
  */
object PipelineOps {

  private val qualityMin = 0.6

  def entries: Seq[Entry] = Seq(
    Entry("pipe_curation",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents")
        // one scan: quality, exact-dup fingerprint, split bucket
        val q = d.select(col("doc_id"), col("lang"),
          TextFunctions.qualityScore(col("text")).as("quality"),
          md5(col("text")).as("fp"),
          TextFunctions.splitBucket(col("doc_id")).as("bucket"))
        val gated = q.filter(col("quality") >= qualityMin)
        // exact dedup among survivors: keep the min doc_id per content
        val wFp = Window.partitionBy(col("fp"))
        val exact = gated
          .withColumn("mid", min(col("doc_id")).over(wFp))
          .filter(col("doc_id") === col("mid"))
        // semantic dedup among remaining survivors: cells from the
        // deterministic IVF quantizer, near-dup pairs within cells only
        val v = VectorOps.embSlim(spark, dir)
        val asg = graft.core.VectorTools.assignCells(
            v.select(col("vec_id").as("id"), col("e")),
            VectorOps.ivfSeedCentroids(spark, dir))
          .select(col("id").as("vec_id"), col("cell"))
        // materialize the SLIM survivor manifest once (no text, no
        // vectors): the self-join below otherwise re-scans documents
        // and recomputes quality/md5 per reference — at 100 TB this is
        // a manifest table written between macro-stages;
        // localCheckpoint is the single-JVM stand-in (the
        // GraphTools/Lloyd discipline)
        val sv = exact.join(asg, col("vec_id") === col("doc_id"))
          .select(col("doc_id"), col("lang"), col("quality"),
            col("bucket"), col("cell"))
          .localCheckpoint()
        val a = sv.select(col("cell"), col("doc_id").as("v1"))
        val b = sv.select(col("cell").as("cell2"), col("doc_id").as("v2"))
        val dropped = a.join(b,
            col("cell") === col("cell2") && col("v1") < col("v2"))
          .join(v.select(col("vec_id").as("v1"), col("e").as("e1"),
            col("nrm").as("n1")), "v1")
          .join(v.select(col("vec_id").as("v2"), col("e").as("e2"),
            col("nrm").as("n2")), "v2")
          .withColumn("sim",
            round(graft.functions.VectorFunctions.dot(
              col("e1"), col("e2")) / (col("n1") * col("n2")), 6))
          .filter(col("sim") >= VectorOps.nearDupThreshold)
          .select(col("v2").as("doc_id")).distinct()
        sv.join(dropped, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("lang"),
            TextFunctions.splitFromBucket(col("bucket")).as("split"),
            col("quality"), col("cell"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH q AS (SELECT doc_id, lang,
        |    round(0.5 * (len(list_distinct(string_split(text, ' ')))::DOUBLE
        |        / len(string_split(text, ' '))::DOUBLE)
        |      + 0.5 * least(1.0, length(text)::DOUBLE / 200.0), 6) AS quality,
        |    md5(text) AS fp,
        |    ${TextFunctions.splitBucketSql("doc_id")} AS bucket
        |  FROM documents),
        |g AS (SELECT * FROM q WHERE quality >= $qualityMin),
        |e AS (SELECT * FROM (SELECT *,
        |    min(doc_id) OVER (PARTITION BY fp) AS mid FROM g)
        |  WHERE doc_id = mid),
        |v AS (${VectorOps.embSql}),
        |c AS (SELECT vec_id AS cid, e AS ce FROM v
        |  WHERE vec_id < ${VectorOps.ivfCells}),
        |s AS (SELECT v.vec_id, c.cid,
        |    round(${VectorOps.cosSql("v.e", "c.ce")}, 6) AS csim
        |  FROM v CROSS JOIN c),
        |asg AS (SELECT vec_id, cid AS cell FROM (
        |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY csim DESC, cid) AS r FROM s) WHERE r = 1),
        |sv AS (SELECT e.doc_id, e.lang, e.quality, e.bucket, asg.cell
        |  FROM e JOIN asg ON asg.vec_id = e.doc_id),
        |dropped AS (SELECT DISTINCT b.doc_id
        |  FROM sv a JOIN sv b ON a.cell = b.cell AND a.doc_id < b.doc_id
        |  JOIN v va ON va.vec_id = a.doc_id
        |  JOIN v vb ON vb.vec_id = b.doc_id
        |  WHERE round(${VectorOps.cosSql("va.e", "vb.e")}, 6)
        |    >= ${VectorOps.nearDupThreshold})
        |SELECT doc_id, lang,
        |  ${TextFunctions.splitCaseSql("bucket")} AS split,
        |  quality, cell
        |FROM sv WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
        |ORDER BY doc_id""".stripMargin)),

    // THE TRAINING-CORPUS MATERIALIZATION RUN — the other end-to-end
    // compose: where pipe_curation emits the curated-corpus manifest,
    // this emits what the TRAINER actually ingests — per-chunk rows
    // of the quality-gated, exact-deduped, mixture-rebalanced corpus:
    //
    //   quality gate (t_quality) → exact dedup (dedup_exact) →
    //   domain mix (t_domain_mix) → overlapping chunking
    //   (t_chunk_overlap)
    //
    // Plan shape, deliberately: everything per-document (quality, dup
    // fingerprint, mix hash) computes in ONE documents scan; the only
    // data-sized shuffle is the SLIM (fp, doc_id, lang, u_ppm) dedup
    // window — text stays in the scan; the mix quotas are a ≤5-row
    // broadcast derived from the survivor counts (so the mixture is
    // computed over what dedup kept, not raw counts); the admitted id
    // set then joins BACK to the documents scan by doc_id and
    // chunking explodes scan-locally, with each chunk reduced to its
    // md5 before the output sort. At 100 TB the join-back is the
    // manifest⋈corpus join every materialization run performs — with
    // the corpus bucketed by doc_id (BucketingSpec's layout) it is
    // co-located and shuffle-free, so the whole run costs one slim
    // shuffle + one co-located join over a single corpus scan.
    Entry("pipe_training_mix",
      (spark, dir) => {
        val d = Registry.table(spark, dir, "documents")
        val q = d.select(col("doc_id"), col("lang"),
            TextFunctions.qualityScore(col("text")).as("quality"),
            md5(col("text")).as("fp"),
            (TextFunctions.tokenHash(col("doc_id").cast("string")) % 1000000)
              .as("u_ppm"))
          .filter(col("quality") >= qualityMin)
        val wFp = Window.partitionBy(col("fp"))
        // materialize the SLIM survivor manifest once: three consumers
        // (quota counts, capacity, selection) would otherwise re-run
        // the documents scan + dedup window per reference (the
        // dedup_shingle_jaccard diamond lesson; a manifest table
        // between macro-stages at 100 TB)
        val keep = q
          .withColumn("mid", min(col("doc_id")).over(wFp))
          .filter(col("doc_id") === col("mid"))
          .select(col("doc_id"), col("lang"), col("u_ppm"))
          .localCheckpoint()
        // the ONE weight table + quota chain (TextOps.mixQuota) —
        // shared with t_domain_mix/s54 so the compose cannot drift
        val quota = TextOps.mixQuota(spark,
            keep.groupBy(col("lang")).agg(count(lit(1)).as("c")))
          .select(col("lang"), col("thr_ppm"))
        val sel = keep.join(broadcast(quota), "lang")
          .filter(col("u_ppm") < col("thr_ppm"))
          .select(col("doc_id"), col("lang"))
        d.select(col("doc_id"), split(col("text"), " ").as("toks"))
          .join(sel, "doc_id")
          .withColumn("n", size(col("toks")).cast("long"))
          .withColumn("start_tok",
            explode(expr("sequence(0L, n - 1, 96L)")))
          .withColumn("len",
            least(lit(128L), col("n") - col("start_tok")))
          .select(col("doc_id"), col("lang"),
            expr("start_tok div 96").as("chunk_id"),
            col("start_tok"), col("len"),
            md5(concat_ws(" ",
              expr("slice(toks, CAST(start_tok + 1 AS INT), CAST(len AS INT))")))
              .as("chunk_fp"))
          .orderBy(col("doc_id"), col("chunk_id"))
      },
      Some(s"""WITH q AS (SELECT doc_id, lang,
        |    round(0.5 * (len(list_distinct(string_split(text, ' ')))::DOUBLE
        |        / len(string_split(text, ' '))::DOUBLE)
        |      + 0.5 * least(1.0, length(text)::DOUBLE / 200.0), 6) AS quality,
        |    md5(text) AS fp,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 1000000 AS u_ppm
        |  FROM documents),
        |g AS (SELECT * FROM q WHERE quality >= $qualityMin),
        |e AS (SELECT * FROM (SELECT *,
        |    min(doc_id) OVER (PARTITION BY fp) AS mid FROM g)
        |  WHERE doc_id = mid),
        |w(lang, w) AS (VALUES ('en', 40), ('de', 15), ('es', 15),
        |  ('fr', 15), ('zh', 15)),
        |c AS (SELECT lang, count(*) AS c FROM e GROUP BY 1),
        |cap AS (SELECT min(c.c * 100 // w.w) AS t
        |  FROM c JOIN w USING (lang)),
        |qta AS (SELECT c.lang,
        |    LEAST(c.c, w.w * cap.t // 100) * 1000000 // c.c AS thr_ppm
        |  FROM c JOIN w USING (lang), cap),
        |sel AS (SELECT e.doc_id, e.lang
        |  FROM e JOIN qta ON e.lang = qta.lang AND e.u_ppm < qta.thr_ppm),
        |t AS (SELECT d.doc_id, sel.lang, string_split(d.text, ' ') AS toks,
        |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n
        |  FROM documents d JOIN sel ON sel.doc_id = d.doc_id),
        |ch AS (SELECT doc_id, lang, n, toks,
        |  unnest(generate_series(0, n - 1, 96)) AS start_tok FROM t)
        |SELECT doc_id, lang, start_tok // 96 AS chunk_id, start_tok,
        |  LEAST(128, n - start_tok) AS len,
        |  md5(array_to_string(
        |    toks[(start_tok + 1):(start_tok + LEAST(128, n - start_tok))],
        |    ' ')) AS chunk_fp
        |FROM ch ORDER BY doc_id, chunk_id""".stripMargin))
  )
}
