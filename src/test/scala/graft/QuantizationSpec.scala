package graft

import org.apache.spark.sql.functions._

import graft.queries.Registry

/** Behavioral checks on the vector-compression rungs beyond their
  * oracle-hashed driver rows: int8 scalar quantization must score
  * almost exactly like float (that is the point of shipping 4× fewer
  * bytes), and the 64→16 JL random projection must preserve angles
  * within the k = 16 distortion envelope. */
class QuantizationSpec extends SparkTestBase {

  private val sfDir = sys.props.getOrElse("graft.testdata.dir",
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001"))

  private def run(name: String) =
    Registry.all.find(_.name == name).get.fn(spark, sfDir)

  test("int8 quantized cosine is within 0.01 of the exact cosine") {
    val exact = run("ann_topk_bruteforce")
      .select(col("query_id"), col("neighbor_id"), col("sim"))
    val quant = run("ann_quantized_topk")
      .select(col("query_id"), col("neighbor_id"), col("qsim"))
    // inner join: pairs ranked top-5 by BOTH scorers (recall ≈ 0.98,
    // so nearly all of them); each agreeing pair must score the same
    // to quantization precision
    val joined = quant.join(exact, Seq("query_id", "neighbor_id"))
    val n = joined.count()
    assert(n > 50, s"top-5 overlap unexpectedly small: $n pairs")
    val maxErr = joined
      .agg(max(abs(col("qsim") - col("sim")))).head.getDouble(0)
    assert(maxErr < 0.01, f"int8 scoring error $maxErr%.5f ≥ 0.01")
  }

  test("int8 recall@5 against the exact float top-5 averages ≥ 0.9") {
    val rec = run("ann_quantized_recall")
      .agg(avg(col("recall"))).head.getDouble(0)
    assert(rec >= 0.9, f"mean recall@5 $rec%.4f < 0.9")
  }

  test("IVF+SQ8 composition agrees with the float IVF path on most of the top-5") {
    val floatTop = run("ann_ivf_topk")
      .select(col("query_id"), col("neighbor_id"))
    val int8Top = run("ann_ivf_quantized_topk")
      .select(col("query_id"), col("neighbor_id"))
    val nQueries = floatTop.select("query_id").distinct().count()
    val overlap = floatTop.join(int8Top,
      Seq("query_id", "neighbor_id")).count()
    val total = floatTop.count()
    assert(nQueries == graft.queries.VectorOps.queryCount,
      s"unexpected query-panel size $nQueries")
    // identical candidate cells, int8-vs-float scoring only reorders
    // near-ties — measured overlap 0.96 at sf0.001; require 0.85
    assert(overlap.toDouble / total >= 0.85,
      s"IVF+SQ8 diverges from float IVF: $overlap/$total")
  }

  test("random projection preserves pairwise angles within JL bounds") {
    val proj = run("v_random_project").collect()
      .map(r => r.getLong(0) ->
        (1 to graft.queries.VectorOps.rpDims).map(r.getDouble).toArray)
      .toMap
    val full = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0d; var na = 0d; var nb = 0d; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }
    val ids = proj.keys.toSeq.sorted.take(60)
    val errs = for { i <- ids; j <- ids if i < j }
      yield math.abs(cos(proj(i), proj(j)) - cos(full(i), full(j)))
    val mean = errs.sum / errs.size
    // k = 16 ⇒ per-pair std ≈ 1/√16 = 0.25; the mean |error| of the
    // estimator sits well under that (measured ≈ 0.19 on the driver
    // corpus at both SFs)
    assert(mean < 0.3, f"mean angular distortion $mean%.4f ≥ 0.3")
  }

  test("sign-bit packing matches the component signs bit for bit") {
    val packed = run("v_sign_bits").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val full = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    assert(packed.nonEmpty)
    for ((id, (lo, hi)) <- packed) {
      val e = full(id)
      var expLo = 0L; var expHi = 0L
      for (i <- 0 until 32) {
        if (e(i) > 0) expLo |= (1L << i)
        if (e(32 + i) > 0) expHi |= (1L << i)
      }
      assert(lo == expLo && hi == expHi,
        s"vec $id packed ($lo, $hi), expected ($expLo, $expHi)")
    }
  }

  test("Hamming ranking's distances equal the reference popcount") {
    val packed = run("v_sign_bits").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = run("ann_hamming_topk").collect()
    assert(rows.length > 50)
    for (r <- rows) {
      val (qlo, qhi) = packed(r.getLong(0))
      val (nlo, nhi) = packed(r.getLong(2))
      val expect = java.lang.Long.bitCount(qlo ^ nlo) +
        java.lang.Long.bitCount(qhi ^ nhi)
      assert(r.getInt(3) == expect,
        s"pair (${r.getLong(0)}, ${r.getLong(2)}): " +
          s"hamming ${r.getInt(3)} != reference $expect")
    }
  }

  test("two-stage rerank recovers recall over binary-only ranking") {
    val bin = run("ann_hamming_recall")
      .agg(avg(col("recall"))).head.getDouble(0)
    val rr = run("ann_hamming_rerank_recall")
      .agg(avg(col("recall"))).head.getDouble(0)
    assert(rr > bin,
      f"rerank recall $rr%.3f not above binary-only $bin%.3f")
    assert(rr >= 0.5, f"rerank recall $rr%.3f unexpectedly low")
  }
}
