package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.{SketchFunctions, TextFunctions, VectorFunctions}
import graft.multimodal.MultimodalPipeline

/** Unit-level behavior of the text/sketch/vector/multimodal function
  * library (the oracle gate checks engine-vs-engine equality; these
  * check semantic properties). */
class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup of 1
    (4L, "der hund und die katze sind nicht da und der ist"),
    (5L, "completely different words about spark engines entirely")
  ).toDF("doc_id", "text")

  test("identical docs get identical minhash signatures; near dups share most") {
    val exploded = TextFunctions.withTokens(docs, col("text"))
      .select(col("doc_id"),
        explode(array_distinct(
          TextFunctions.shingles3FromTokens(col("toks")))).as("sh"))
    val sig = SketchFunctions.minhashSignature(exploded, "doc_id")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(sig(1L) == sig(2L))
    val sharedWithNear = sig(1L).zip(sig(3L)).count { case (a, b) => a == b }
    val sharedWithFar = sig(1L).zip(sig(5L)).count { case (a, b) => a == b }
    assert(sharedWithNear > sharedWithFar)
  }

  test("simhash: identical docs equal, near dups within small hamming distance") {
    val toks = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), TextFunctions.tokenHash(col("tok")).as("th"))
    val sh = SketchFunctions.simhash32(toks, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(3L)) < hamming(sh(1L), sh(5L)))
  }

  test("langId picks the stopword-dominant language deterministically") {
    val got = docs.select(col("doc_id"), TextFunctions.langId(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(4L) == "de")
  }

  test("cosine is 1 for identical and 0 for orthogonal vectors") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)),
      (Seq(1.0, 0.0, 0.0), Seq(0.0, 5.0, 0.0))
    ).toDF("a", "b")
    val cos = df.select(VectorFunctions.cosine(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    assert(math.abs(cos(0) - 1.0) < 1e-12)
    assert(math.abs(cos(1)) < 1e-12)
  }

  test("lsh buckets: identical vectors share a bucket") {
    val df = Seq(
      (1L, Seq.tabulate(64)(i => math.sin(i.toDouble))),
      (2L, Seq.tabulate(64)(i => math.sin(i.toDouble))),
      (3L, Seq.tabulate(64)(i => math.cos(i * 3.0)))
    ).toDF("id", "e")
    val b = df.select(col("id"),
      VectorFunctions.lshBucket(col("e"), planes = 8, dims = 64).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(1L) == b(2L))
  }

  test("frame sampling chunks the payload with correct sizes") {
    val one = Seq((1L, "a" * 150)).toDF("doc_id", "text")
    val frames = MultimodalPipeline.sampleFrames(one, col("text"),
      frameBytes = 64, maxFrames = 4).collect()
    assert(frames.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
    assert(frames.map(_.getLong(3)).toSeq == Seq(64L, 64L, 22L))
  }

  test("winnowing: shared long substring guarantees shared fingerprints; disjoint texts share none") {
    val common = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq(
      (1L, common + " alpha beta gamma delta epsilon zeta"),
      (2L, "totally different prefix here then " + common),
      (3L, "zxqwv jkl mnop qrstu abcde fghij klmno pqrst uvwxy")
    ).toDF("doc_id", "text")
    val fps = df
      .select(col("doc_id"),
        graft.functions.TextFunctions.winnowHashes(col("text")).as("hs"))
      .select(col("doc_id"),
        graft.functions.TextFunctions.winnowFromHashes(col("hs")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // guarantee: any shared substring of length >= k+w-1 (= 11 chars)
    // yields at least one shared fingerprint
    assert((fps(1L) & fps(2L)).nonEmpty)
    assert((fps(1L) & fps(3L)).isEmpty)
  }

  test("dedup quirk: equal-ts versions keep first-encountered (strict >)") {
    import graft.core.VersionedDedup
    val rows = Iterator(("id1", 5L, "first"), ("id1", 5L, "second"))
    val kept = VersionedDedup.latestPerId[(String, Long, String)](
      rows, _._1, _._2)
    assert(kept.map(_._3) == Seq("first"))
  }

  test("count-min estimates never underestimate and are exact for " +
    "collision-free buckets") {
    val toks = docs.select(explode(TextFunctions.tokens(col("text"))).as("tok"))
    val cms = toks
      .select(explode(SketchFunctions.cmsCoords(
        TextFunctions.tokenHash(col("tok")))).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val est = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
      .select(col("tok"), col("n_exact"),
        explode(SketchFunctions.cmsCoords(
          TextFunctions.tokenHash(col("tok")))).as("rb"))
      .select(col("tok"), col("n_exact"),
        col("rb.r").as("r"), col("rb.b").as("b"))
      .join(cms, Seq("r", "b"))
      .groupBy(col("tok"), col("n_exact"))
      .agg(min(col("cnt")).as("n_cms"))
      .collect()
    assert(est.nonEmpty)
    // CMS guarantee: min over rows is an overestimate, never an under
    est.foreach { r =>
      assert(r.getAs[Long]("n_cms") >= r.getAs[Long]("n_exact"),
        s"CMS underestimated ${r.getAs[String]("tok")}")
    }
    // this tiny vocabulary (~30 distinct « w=1024): with 4 independent
    // rows a same-bucket collision in EVERY row is overwhelmingly
    // unlikely, so the min should be exact for all tokens
    val exact = est.count(r => r.getAs[Long]("n_cms") == r.getAs[Long]("n_exact"))
    assert(exact == est.length,
      s"only $exact/${est.length} exact at vocab << width")
  }
}
