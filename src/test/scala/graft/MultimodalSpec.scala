package graft

import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalPipeline

/** Properties of the multimodal chunkers, centered on the one that
  * motivates content-defined chunking: boundary survival under edits. */
class MultimodalSpec extends SparkTestBase {

  private def chunksOf(texts: Seq[(Long, String)],
                       cdc: Boolean): Map[Long, Seq[String]] = {
    import spark.implicits._
    val df = texts.toDF("doc_id", "text")
    val out =
      if (cdc) MultimodalPipeline.cdcChunkHashes(df, col("text"),
        window = 16, divisor = 32)
      else MultimodalPipeline.chunkHashes(df, col("text"), chunkBytes = 32)
    out.orderBy(col("doc_id"), col("chunk_idx"))
      .select(col("doc_id"), col("chunk_md5"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(1)).toSeq).toMap
  }

  private val base = (0 until 40).map(i => s"sentence number $i padded out.")
    .mkString(" ")

  test("cdc chunks cover the payload exactly (concat of chunks == payload)") {
    import spark.implicits._
    val df = Seq((1L, base)).toDF("doc_id", "text")
    val rebuilt = MultimodalPipeline.cdcChunkHashes(df, col("text"),
        window = 16, divisor = 32)
      .orderBy(col("chunk_idx"))
      .agg(sum(col("chunk_len"))).head().getLong(0)
    assert(rebuilt == base.length, "chunk lengths must sum to payload length")
  }

  test("an insertion re-chunks only its neighborhood under CDC, " +
    "but shifts every downstream chunk under fixed-size chunking") {
    val edited = base.substring(0, 50) + "INSERTED BYTES " + base.substring(50)
    val cdc = chunksOf(Seq((1L, base), (2L, edited)), cdc = true)
    val fixed = chunksOf(Seq((1L, base), (2L, edited)), cdc = false)

    def shared(m: Map[Long, Seq[String]]): Int =
      m(1L).toSet.intersect(m(2L).toSet).size

    // CDC: all chunks strictly after the edit's neighborhood survive —
    // at least half of the original chunk set must still match.
    assert(shared(cdc) * 2 >= cdc(1L).size,
      s"CDC kept only ${shared(cdc)} of ${cdc(1L).size} chunks after a " +
        "front insertion — boundaries failed to re-synchronize")
    // Fixed-size: the 15-byte shift misaligns every downstream block;
    // only content before the edit can still match.
    assert(shared(fixed) <= 2,
      s"fixed-size chunking unexpectedly kept ${shared(fixed)} chunks " +
        "across a non-block-aligned insertion")
    // and CDC must beat fixed-size on this workload — the whole point
    assert(shared(cdc) > shared(fixed))
  }

  // s37's scan stage counts per-doc chunk multiplicities with a
  // sorted-runs single pass; pin it to the naive explode-and-count
  // oracle so the O(n log n) rewrite can never drift from it.
  test("cdc chunk-count rows match the explode-and-count oracle") {
    import spark.implicits._
    // repeat a block so some chunks recur WITHIN one document
    val texts = Seq(1L -> (base + " " + base), 2L -> base,
      3L -> "short", 4L -> "")
    val df = texts.toDF("doc_id", "text")
    val got = graft.queries.StreamingOps.cdcChunkCountRows(df)
      .groupBy(col("doc_id"), col("chunk_md5"))
      .agg(sum(col("cnt")).as("cnt"))
    val want = MultimodalPipeline.cdcChunkHashes(df, col("text"),
        window = 16, divisor = 32)
      .groupBy(col("doc_id"), col("chunk_md5"))
      .agg(count(lit(1)).as("cnt"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "sorted-runs multiplicity counting diverged from explode-and-count")
  }
}
