package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate — the mergeable-sketch alternative to
  * `approx_count_distinct` whose estimate is DETERMINISTIC and
  * ENGINE-INDEPENDENT: it is a pure function of the input's hash set
  * (Bar-Yossef et al. 2002, "Counting distinct elements in a data
  * stream"). Spark's HLL++ estimate depends on its private register
  * layout, so no other engine can reproduce the number (the
  * `q_approx_distinct` oracle can only bounds-check it); the KMV
  * estimate here is hash-matched bit-for-bit by a DuckDB SQL
  * re-derivation ([[KmvSketch.oracleAggSql]]).
  *
  * Contract: input is an already-hashed 64-bit value (the caller picks
  * the hash — [[TextFunctions.fingerprint64]], 15 md5 hex digits,
  * uniform on [0, 2^60)). The buffer keeps the K smallest DISTINCT
  * hashes; merge is set-union-then-trim (commutative, associative,
  * idempotent), so map-side partial aggregation ships K longs per
  * group per partition — at 100 TB the full token stream is never
  * shuffled, only ~K·groups·partitions sketch entries. In streaming
  * aggregation the same buffer IS the per-group state (bounded at K
  * longs, never the values), maintained across microbatches by the
  * engine.
  *
  * Returns `struct(n_min: bigint, kth: bigint)`: the retained-hash
  * count (= exact distinct count while < K) and the K-th smallest
  * hash (null on an empty group). [[KmvSketch.estimate]] turns the
  * pair into the distinct-count estimate; keeping the float math in
  * the query layer keeps the aggregate integer-exact and lets the
  * oracle mirror the arithmetic textually.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    emitHashes: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def prettyName: String = "graft_kmv"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName aggregates pre-hashed BIGINT values, got " +
            other.simpleString)
    }

  override def nullable: Boolean = false

  /** Summary mode returns the (count, k-th hash) pair the estimator
    * needs; `emitHashes` returns the retained hash set itself
    * (ascending) — the form sketch SET OPERATIONS consume (union /
    * Jaccard / intersection across corpora, [[KmvSketch.unionMin]]):
    * k longs per group, still a constant-size aggregate output. */
  override def dataType: DataType =
    if (emitHashes) ArrayType(LongType, containsNull = false)
    else StructType(Seq(
      StructField("n_min", LongType, nullable = false),
      StructField("kth", LongType, nullable = true)))

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) {
      if (buf.add(v)) { buf.remove(buf.last); () }
    }
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (emitHashes) {
      val arr = new Array[Any](buf.size)
      val it = buf.iterator() // TreeSet iterates ascending
      var i = 0
      while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
      new GenericArrayData(arr)
    } else
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](buf.size.toLong,
          if (buf.size < k) null else buf.last.longValue()))

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

object KmvSketch {

  /** Hash domain size: [[TextFunctions.fingerprint64]] is 15 md5 hex
    * digits = 60 bits, uniform on [0, M). */
  val M: Double = math.pow(2, 60) // exactly representable (1 sig bit)

  /** Default sketch width: 64 longs/group ⇒ ~1/√(k−2) ≈ 12.7% relative
    * standard error — cardinality-monitoring grade at 512 bytes. */
  val DefaultK = 64

  /** The sketch as an aggregate Column over a pre-hashed bigint
    * column. */
  def kmvSketch(hashed: Column, k: Int = DefaultK): Column =
    org.apache.spark.sql.graft.Bridge.column(
      KmvSketchAgg(
        org.apache.spark.sql.graft.Bridge.expression(hashed), k)
        .toAggregateExpression())

  /** Distinct-count estimate from a sketch struct: exact while the
    * group held fewer than k distinct hashes, else the KMV estimator
    * (k−1)·M / h_(k) floored to a bigint. Every operation (long→double
    * widening, one multiply, one divide, floor) is IEEE-754-exact or
    * correctly rounded identically in any engine, so
    * [[oracleEstimateSql]] reproduces the value bit-for-bit. */
  def estimate(sketch: Column, k: Int = DefaultK): Column =
    when(sketch("kth").isNull, sketch("n_min"))
      .otherwise(floor(lit((k - 1).toDouble) * lit(M) /
        greatest(sketch("kth"), lit(1L)).cast("double")).cast("long"))

  /** The sketch emitting its retained k-min hash set (ascending
    * `array<bigint>`, ≤ k elements) — the representation sketch SET
    * OPERATIONS consume. Two corpora never need joining to estimate
    * their overlap: ship one ≤64-long array per side. */
  def kmvHashes(hashed: Column, k: Int = DefaultK): Column =
    org.apache.spark.sql.graft.Bridge.column(
      KmvSketchAgg(
        org.apache.spark.sql.graft.Bridge.expression(hashed), k,
        emitHashes = true).toAggregateExpression())

  /** The k smallest distinct hashes of A ∪ B, computed from the two
    * sides' k-min sets alone. Sound because any of the k smallest
    * hashes of the true union that came from A is necessarily among
    * A's own k smallest — so the union's k-min set is fully contained
    * in Ak ∪ Bk (the closure property all KMV set ops rest on). */
  def unionMin(a: Column, b: Column, k: Int = DefaultK): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** [[estimate]] over a k-min hash ARRAY (e.g. [[unionMin]]'s
    * output): exact while fewer than k hashes exist, else the KMV
    * estimator on the k-th element. */
  def estimateFromHashes(u: Column, k: Int = DefaultK): Column =
    when(size(u) < k, size(u).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble) * lit(M) /
        greatest(element_at(u, k), lit(1L)).cast("double")).cast("long"))

  /** Of the union's k-min hashes, how many fall in BOTH sides' k-min
    * sets — the coincidence count C whose ratio C/|U| estimates the
    * Jaccard similarity (for h ∈ U, h ∈ A ⟺ h ∈ Ak, so membership
    * tests against the sketches are exact). Intersection cardinality
    * then estimates as C·|A∪B|est/|U| — composed in the query so the
    * oracle can mirror the arithmetic textually. */
  def coincidences(u: Column, a: Column, b: Column): Column =
    size(array_intersect(u, array_intersect(a, b))).cast("long")

  /** DuckDB re-derivation of [[kmvSketch]]+[[estimate]] over a relation
    * `(grp, h)` of pre-hashed values: rank distinct hashes per group
    * (nulls excluded, mirroring the aggregate's null skip — DISTINCT
    * alone would rank the NULL row and inflate the count by one), keep
    * the count and the k-th smallest, apply the same estimator
    * arithmetic. Compose into a WITH chain; `grp`/`h` are column names
    * in `src`. */
  def oracleEstimateSql(src: String, grp: String, h: String,
                        k: Int = DefaultK): String =
    s"""(SELECT $grp, CASE WHEN max(rn) < $k THEN max(rn)
       |  ELSE CAST(floor(${k - 1}.0 * ${M.toLong}.0 /
       |    CAST(GREATEST(max(CASE WHEN rn = $k THEN $h END), 1) AS DOUBLE))
       |    AS BIGINT) END AS n_kmv
       | FROM (SELECT $grp, $h, row_number() OVER
       |         (PARTITION BY $grp ORDER BY $h) AS rn
       |       FROM (SELECT DISTINCT $grp, $h FROM $src
       |             WHERE $h IS NOT NULL))
       | GROUP BY $grp)""".stripMargin
}
