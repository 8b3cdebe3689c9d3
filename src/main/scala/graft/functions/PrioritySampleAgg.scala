package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hash-priority bottom-k SAMPLE as a native Catalyst aggregate — the
  * quantile member of the deterministic sketch family (KMV = distinct
  * count, CMS = frequency, Bloom = membership, this = order
  * statistics). Spark's `approx_percentile` (KLL) and t-digest
  * sketches are merge-order-dependent, so no other engine can
  * reproduce their output and the driver can only bounds-check them
  * (`q_approx_percentile`); a bottom-k-by-hash sample is a pure
  * function of the input SET — the k (hash, value) pairs with the
  * smallest hashes survive any partitioning, any merge tree, any
  * arrival order — so quantile estimates computed from it are
  * DETERMINISTIC and a DuckDB re-derivation hash-matches them
  * bit-for-bit (priority sampling: Duffield, Lund & Thorup 2007;
  * the bottom-k form of Cohen & Kaplan 2007).
  *
  * Contract: `hash` is a 64-bit priority ([[TextFunctions
  * .fingerprint64]] of a UNIQUE row key — hashing a unique key makes
  * the sample uniform over ROWS; hashing the value itself would make
  * it uniform over distinct values), `value` is the measured double.
  * The buffer keeps the k smallest DISTINCT (hash, value) pairs in
  * (hash, value) order; merge is set-union-then-trim (commutative,
  * associative, idempotent), so map-side partials ship ≤ k pairs per
  * group per partition — the row stream itself is never shuffled on
  * the sketch path, and in streaming aggregation the buffer IS the
  * bounded per-group state, maintained across microbatches by the
  * engine. Returns the sampled values as `array<double>` ordered by
  * ascending (hash, value); [[PrioritySample.discQuantile]] turns the
  * array into a discrete quantile, keeping the estimator arithmetic
  * in the query layer where the oracle can mirror it textually.
  */
case class PrioritySampleAgg(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[PrioritySampleAgg.Pair]]
    with BinaryLike[Expression] {

  require(k >= 1, s"priority sample needs k >= 1, got $k")

  override def prettyName: String = "graft_priority_sample"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName takes (hash: BIGINT, value: DOUBLE), got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[PrioritySampleAgg.Pair] =
    new java.util.TreeSet[PrioritySampleAgg.Pair]()

  override def update(buf: java.util.TreeSet[PrioritySampleAgg.Pair],
                      input: InternalRow): java.util.TreeSet[PrioritySampleAgg.Pair] = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      add(buf, PrioritySampleAgg.Pair(h.asInstanceOf[Long], v.asInstanceOf[Double]))
    buf
  }

  override def merge(buf: java.util.TreeSet[PrioritySampleAgg.Pair],
                     other: java.util.TreeSet[PrioritySampleAgg.Pair]): java.util.TreeSet[PrioritySampleAgg.Pair] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  private def add(buf: java.util.TreeSet[PrioritySampleAgg.Pair],
                  p: PrioritySampleAgg.Pair): Unit = {
    if (buf.size < k) { buf.add(p); () }
    else if (p.compareTo(buf.last) < 0) {
      if (buf.add(p)) { buf.remove(buf.last); () }
    }
  }

  override def eval(buf: java.util.TreeSet[PrioritySampleAgg.Pair]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator() // TreeSet iterates ascending by (hash, value)
    var i = 0
    while (it.hasNext) { arr(i) = it.next().v; i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[PrioritySampleAgg.Pair]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p.h); bb.putDouble(p.v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[PrioritySampleAgg.Pair] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[PrioritySampleAgg.Pair]()
    var i = 0
    while (i < n) { buf.add(PrioritySampleAgg.Pair(bb.getLong, bb.getDouble)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PrioritySampleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PrioritySampleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PrioritySampleAgg =
    copy(left = newLeft, right = newRight)
}

object PrioritySampleAgg {
  /** One retained (priority hash, value) pair; natural order = (h, v)
    * ascending, the survival order of the sketch. The value
    * participates in the order only to make a hash collision
    * deterministic — with a unique-key hash, collisions are ~2⁻⁶⁰. */
  final case class Pair(h: Long, v: Double) extends Comparable[Pair] {
    override def compareTo(o: Pair): Int = {
      val c = java.lang.Long.compare(h, o.h)
      if (c != 0) c else java.lang.Double.compare(v, o.v)
    }
  }
}

object PrioritySample {

  /** Default sample width: 256 doubles/group ⇒ quantile rank error
    * ~1/√k ≈ 6% rse — monitoring grade at 2 KB, and exact while the
    * group holds fewer than k rows. */
  val DefaultK = 256

  /** The sample as an aggregate Column: k smallest-hash values,
    * emitted ascending by (hash, value). */
  def sample(hash: Column, value: Column, k: Int = DefaultK): Column =
    org.apache.spark.sql.graft.Bridge.column(
      PrioritySampleAgg(
        org.apache.spark.sql.graft.Bridge.expression(hash),
        org.apache.spark.sql.graft.Bridge.expression(value), k)
        .toAggregateExpression())

  /** Discrete quantile over a VALUE-sorted sample array: the element
    * at 1-based rank ⌈q·n⌉ (the smallest sample value whose empirical
    * CDF reaches q — percentile_disc semantics). Pure element
    * selection, no interpolation arithmetic, so the result is a raw
    * input double and hash-matches across engines. Pass the sorted
    * array in (sort once, select many). An EMPTY sample (every input
    * hash/value null for the group) yields NULL — without the guard
    * the clamped rank 1 would element_at an empty array, which is a
    * runtime error under ANSI mode. */
  def discQuantile(sortedXs: Column, q: Double): Column =
    when(size(sortedXs) === 0, lit(null).cast("double"))
      .otherwise(element_at(sortedXs,
        greatest(ceil(lit(q) * size(sortedXs)).cast("int"), lit(1))))

  /** DuckDB re-derivation of [[sample]] over a relation
    * `(grp, h, value)`: distinct pairs (mirroring the set buffer),
    * rank by (h, value), keep k, list values sorted. Compose into a
    * WITH chain; yields `(grp, xs)`. */
  def oracleSampleSql(src: String, grp: String, h: String, v: String,
                      k: Int = DefaultK): String =
    s"""(SELECT $grp, list($v ORDER BY $v) AS xs
       | FROM (SELECT $grp, $v, row_number() OVER
       |         (PARTITION BY $grp ORDER BY $h, $v) AS rn
       |       FROM (SELECT DISTINCT $grp, $h, $v FROM $src
       |             WHERE $h IS NOT NULL AND $v IS NOT NULL))
       | WHERE rn <= $k GROUP BY $grp)""".stripMargin

  /** DuckDB twin of [[discQuantile]] over a list column expression.
    * The q literal is cast to DOUBLE before the multiply: DuckDB
    * parses `0.9` as DECIMAL (exact decimal math), Spark's `lit(q)`
    * is IEEE double. At k ≤ 256 the two ceilings provably coincide
    * (the double product's error stays under half an ulp, so a
    * decimal-exact integer rank rounds back to the exact integer),
    * but the cast removes the decimal-vs-double asymmetry class
    * outright instead of leaning on that magnitude argument — both
    * engines run the identical IEEE multiply-then-ceil at any k.
    * Mirrors the empty-sample NULL guard of [[discQuantile]]. */
  def discQuantileSql(xs: String, q: Double): String =
    s"(CASE WHEN len($xs) = 0 THEN NULL ELSE " +
      s"$xs[GREATEST(CAST(ceil(CAST($q AS DOUBLE) * len($xs)) AS INT), 1)] END)"
}
