package graft

import org.apache.spark.sql.functions._

import graft.queries.Registry

/** Testdata-vintage drift tolerance. The events µs/ns episode
  * (CORRECTNESS r08/r09: one dtype change in driver-regenerated
  * parquet silently killed 48 queries for two rounds) generalizes to
  * any width drift — `Registry.table` therefore normalizes the three
  * pipeline tables to their canonical dtypes on load. This spec
  * regenerates the tables with drifted-but-value-preserving dtypes
  * (narrower ids, wider label, float→double embeddings — every drift
  * a cast can round-trip exactly) and requires REPRESENTATIVE queries
  * over each table to return bit-identical results. */
class VintageSpec extends SparkTestBase {

  private val sfDir = sys.props.getOrElse("graft.testdata.dir",
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001"))

  test("integer/float-width vintage drift in regenerated testdata is invisible") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_vintage_")
    def deleteRec(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).forEach(deleteRec(_))
      java.nio.file.Files.deleteIfExists(p)
    }
    try {
      // drifted events: 32-bit ids (ts vintage handling is already
      // covered by Registry.table's dtype sniff; source read through
      // it so this spec is itself vintage-proof)
      Registry.table(spark, sfDir, "events")
        .withColumn("event_id", col("event_id").cast("int"))
        .withColumn("user_id", col("user_id").cast("int"))
        .write.parquet(s"$tmp/events.parquet")
      // drifted documents: 32-bit id and length
      Registry.table(spark, sfDir, "documents")
        .withColumn("doc_id", col("doc_id").cast("int"))
        .withColumn("n_chars", col("n_chars").cast("int"))
        .write.parquet(s"$tmp/documents.parquet")
      // drifted embeddings: 32-bit id, 64-bit label, float64 vectors
      // (float→double→float round-trips exactly, so values survive)
      Registry.table(spark, sfDir, "embeddings")
        .withColumn("vec_id", col("vec_id").cast("int"))
        .withColumn("label", col("label").cast("bigint"))
        .withColumn("embedding", col("embedding").cast("array<double>"))
        .write.parquet(s"$tmp/embeddings.parquet")

      // one query per table: typed versioned join over events, text
      // dedup over documents, vector math over embeddings
      for (name <- Seq("j1_full_outer", "dedup_exact", "v_norms")) {
        val e = Registry.all.find(_.name == name).get
        val want = e.fn(spark, sfDir).collect().toSeq
        val got = e.fn(spark, tmp.toString).collect().toSeq
        assert(want.nonEmpty, s"$name returned nothing on canonical data")
        assert(got == want,
          s"$name differs under vintage drift: " +
            s"${got.diff(want).take(3)} vs ${want.diff(got).take(3)}")
      }
    } finally deleteRec(tmp)
  }

  test("a VALUE-changing float64 embedding drift is closed by the " +
    "oracle-side canonical-cast mirror") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_vintage_v_")
    def deleteRec(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).forEach(deleteRec(_))
      java.nio.file.Files.deleteIfExists(p)
    }
    try {
      // drift that does NOT round-trip through float32: +1e-9 is far
      // below float32 resolution at these magnitudes, so the double
      // keeps it and the canonical cast drops it
      Registry.table(spark, sfDir, "embeddings")
        .withColumn("embedding",
          expr("transform(cast(embedding AS array<double>), x -> x + 1e-9)"))
        .write.parquet(s"$tmp/embeddings.parquet")

      def vals(df: org.apache.spark.sql.DataFrame): Seq[Seq[Double]] = df
        .orderBy(col("vec_id")).limit(20)
        .select(col("embedding").cast("array<double>"))
        .collect().toSeq.map(_.getSeq[Double](0).toSeq)

      // what the Spark side computes on: canonical float32
      val sparkSide = vals(Registry.table(spark, tmp.toString, "embeddings"))
      // what an UN-mirrored oracle would read: the raw doubles
      val oracleRaw = vals(spark.read.parquet(s"$tmp/embeddings.parquet"))
      // what the mirrored oracle reads: CAST(embedding AS REAL[]) over
      // the raw parquet (IEEE round-to-nearest, same as Spark's cast)
      val oracleMirrored = vals(spark.read
        .parquet(s"$tmp/embeddings.parquet")
        .withColumn("embedding", col("embedding").cast("array<float>")))

      assert(oracleRaw != sparkSide,
        "drift must be value-changing, or this spec tests nothing")
      assert(oracleMirrored == sparkSide,
        "the mirrored cast must reproduce the Spark-side values exactly")
      // and the rewrite actually injects that cast into dumped oracles
      val rewritten = Registry.mirrorCanonicalSql(
        "SELECT vec_id FROM embeddings", tmp.toString)
      assert(rewritten.contains("CAST(embedding AS REAL[])") &&
        rewritten.contains(s"$tmp/embeddings.parquet"))
      // WITH / WITH RECURSIVE prefixes keep a single WITH clause
      assert(Registry.mirrorCanonicalSql("WITH x AS (SELECT 1) SELECT * FROM x",
        "/d").startsWith("WITH documents AS"))
      assert(Registry.mirrorCanonicalSql(
        "WITH RECURSIVE x AS (SELECT 1) SELECT * FROM x",
        "/d").startsWith("WITH RECURSIVE documents AS"))
    } finally deleteRec(tmp)
  }
}
