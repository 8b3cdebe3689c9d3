package graft.functions

import java.nio.ByteBuffer
import java.util.Comparator

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable per-group top-k as a native Catalyst aggregate: keeps
  * the k smallest (score, id) pairs under the total order
  * (score ASC, id ASC) — the serving tail of every ANN rung, where
  * the conventional `row_number() OVER (PARTITION BY query_id ...)`
  * window ships EVERY scored candidate row to one reducer per query
  * (20 reducers regardless of cluster size at 100 TB). As an
  * aggregate the k-best reduce MAP-SIDE: each partition retains at
  * most k pairs per query before the exchange, so the shuffle
  * carries k·queries·partitions pairs instead of the full scored
  * set, and the merge (union-then-trim, commutative + associative)
  * finishes per query in O(k). Descending orders negate the score at
  * the call site (IEEE negation is exact, so the caller recovers the
  * original value bit-for-bit).
  *
  * The buffer is a bounded TreeSet under (score ASC, id ASC); -0.0
  * normalizes to 0.0 FOR COMPARISON ONLY (SQL engines order them
  * equal where `Double.compare` does not) while the emitted score
  * stays verbatim. Ids are unique per group (they are vector/doc
  * ids), so set semantics lose nothing. Returns the pairs as an
  * ascending `array<struct<score double, id bigint>>`; callers
  * posexplode to (rank, id, score).
  */
case class TopKPairsAgg(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[TopKPairsAgg.Pair]]
    with BinaryLike[Expression] {

  require(k >= 1, s"top-k needs k >= 1, got $k")

  override def prettyName: String = "graft_topk_pairs"

  override def left: Expression = score
  override def right: Expression = id

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (s, i) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (double score, bigint id), got " +
            s"(${s.simpleString}, ${i.simpleString})")
    }

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[TopKPairsAgg.Pair] =
    new java.util.TreeSet[TopKPairsAgg.Pair](TopKPairsAgg.ordering)

  override def update(buf: java.util.TreeSet[TopKPairsAgg.Pair],
                      input: InternalRow): java.util.TreeSet[TopKPairsAgg.Pair] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      add(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[TopKPairsAgg.Pair],
                     other: java.util.TreeSet[TopKPairsAgg.Pair])
      : java.util.TreeSet[TopKPairsAgg.Pair] = {
    val it = other.iterator()
    while (it.hasNext) { val p = it.next(); add(buf, p.score, p.id) }
    buf
  }

  private def add(buf: java.util.TreeSet[TopKPairsAgg.Pair],
                  s: Double, i: Long): Unit = {
    val p = new TopKPairsAgg.Pair(s, i)
    if (buf.size < k) { buf.add(p); () }
    else if (TopKPairsAgg.ordering.compare(p, buf.last) < 0) {
      if (buf.add(p)) { buf.remove(buf.last); () }
    }
  }

  override def eval(buf: java.util.TreeSet[TopKPairsAgg.Pair]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator() // ascending (score, id)
    var i = 0
    while (it.hasNext) {
      val p = it.next()
      arr(i) = new GenericInternalRow(Array[Any](p.score, p.id))
      i += 1
    }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[TopKPairsAgg.Pair]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val p = it.next(); bb.putDouble(p.score); bb.putLong(p.id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[TopKPairsAgg.Pair] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(new TopKPairsAgg.Pair(bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairsAgg =
    copy(score = newLeft, id = newRight)
}

object TopKPairsAgg {

  /** Mutable on purpose (plain fields, no case class): buffer entries
    * churn at update rate on the map side. */
  final class Pair(val score: Double, val id: Long)

  /** (score ASC, id ASC) with -0.0 == 0.0 — the SQL sort order the
    * window-based tails (and the DuckDB oracles) rank under. */
  val ordering: Comparator[Pair] = new Comparator[Pair] {
    override def compare(a: Pair, b: Pair): Int = {
      val as = if (a.score == 0d) 0d else a.score
      val bs = if (b.score == 0d) 0d else b.score
      val c = java.lang.Double.compare(as, bs)
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    }
  }

  /** The k smallest (score, id) pairs per group, ascending — negate
    * the score for a descending rank (and un-negate the emitted
    * struct's score; IEEE negation round-trips bit-for-bit). */
  def topkPairs(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      TopKPairsAgg(
        org.apache.spark.sql.graft.Bridge.expression(score),
        org.apache.spark.sql.graft.Bridge.expression(id), k)
        .toAggregateExpression())
}
