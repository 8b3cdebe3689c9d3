package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math as pure Column expressions over
  * `array<double>` columns — codegen'd, no UDFs, and with a sequential
  * left-to-right accumulation order that DuckDB's list functions share,
  * so doubles match the oracle bit-for-bit.
  */
object VectorFunctions {

  /** Sequential dot product — native codegen expression (see
    * [[DotProductExpr]]; the HOF `aggregate(zip_with(..))` form is
    * interpreted and ~50× slower in all-pairs joins). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      DotProductExpr(org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane for sign-LSH bucketing:
    * integer components derived from md5 so Scala and SQL generate the
    * same plane. Component (p,d) = H("p_<p>_<d>") % 2001 − 1000 where H
    * is the 8-hex-char md5 prefix as an integer. */
  def planeComponents(p: Int, dims: Int): Seq[Int] =
    (0 until dims).map { d =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"p_${p}_$d".getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(
        md.take(4).map("%02x".format(_)).mkString, 16)
      (h % 2001L).toInt - 1000
    }

  /** Sign-LSH bucket id (0..2^planes−1) of an embedding. */
  def lshBucket(vec: Column, planes: Int, dims: Int): Column =
    (0 until planes).map { p =>
      val plane = array(planeComponents(p, dims).map(v => lit(v.toDouble)): _*)
      when(dot(plane, vec) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Banded sign-LSH: `bands` independent bucket ids, band k built from
    * planes [k*rows, (k+1)*rows). Two vectors are join candidates when
    * they agree on ANY band (the minhash-banding OR-construction applied
    * to random hyperplanes) — per-pair catch probability
    * 1−(1−p^rows)^bands where p = 1−θ/π. Returned as an
    * `array<int>` indexed by band, ready for posexplode into
    * (band, bucket) join keys. */
  def bandBuckets(vec: Column, bands: Int, rows: Int, dims: Int): Column =
    array((0 until bands).map { k =>
      (0 until rows).map { r =>
        val plane = array(planeComponents(k * rows + r, dims)
          .map(v => lit(v.toDouble)): _*)
        when(dot(plane, vec) > 0, lit(1 << r)).otherwise(lit(0))
      }.reduce(_ + _).cast("int")
    }: _*)
}
