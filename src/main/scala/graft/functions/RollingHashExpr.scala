package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** O(n) kernel behind [[RollingHashExpr]], shared by interpreted eval
  * and generated code (the generated Java emits one static call per
  * row, keeping the whole operator inside whole-stage codegen with no
  * per-character expression dispatch).
  */
object RollingHash {

  /** Polynomial rolling hashes of all `k`-grams of `s` — value-
    * identical to the composable form it replaces
    * (`transform(sequence(...), i -> Σ ascii(substr(i+j,1))·B^(k-1-j)
    * mod P)`, see [[TextFunctions.polyWindowHashes]]) but incremental:
    * one character read per position instead of a k-term expression
    * tree, O(n) instead of O(n·k) interpreted.
    *
    * Gram i (0-based; `max(1, n-k+1)` grams) hashes characters
    * [i, i+k) with positions past the end contributing 0 — exactly
    * `ascii('') = 0` in the composable form, so short/empty inputs
    * produce the same single partial-window hash. Character value =
    * Spark's `ascii` (first byte of the code point, = the code point
    * for 7-bit text; the DuckDB oracles use `ord`, identical on the
    * ASCII corpora both engines hash). Constants B, P are
    * [[TextFunctions.winnowB]]/[[TextFunctions.winnowP]]; all residues
    * are canonical (in [0, P)), which for the non-negative ASCII
    * values matches the composable form's plain `sum % P` bit-for-bit.
    */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val B = TextFunctions.winnowB
    val P = TextFunctions.winnowP
    val bytes = s.getBytes
    // character values: the first byte of each code point (UTF-8
    // continuation bytes have the two high bits 10), signed — the
    // exact value Spark's ascii(substr(text, i, 1)) yields
    var n = 0
    var p = 0
    while (p < bytes.length) {
      if ((bytes(p) & 0xC0) != 0x80) n += 1
      p += 1
    }
    val vals = new Array[Int](n)
    var ci = 0
    p = 0
    while (p < bytes.length) {
      if ((bytes(p) & 0xC0) != 0x80) { vals(ci) = bytes(p); ci += 1 }
      p += 1
    }
    val nGrams = math.max(1, n - k + 1)
    val out = new Array[Long](nGrams)
    // first window by Horner (characters past the end contribute 0)
    var h = 0L
    var j = 0
    while (j < k) {
      h = (h * B + (if (j < n) vals(j) else 0)) % P
      j += 1
    }
    out(0) = h
    if (nGrams > 1) {
      // B^(k-1) mod P: the leading character's weight
      var bk1 = 1L
      j = 0
      while (j < k - 1) { bk1 = bk1 * B % P; j += 1 }
      var i = 1
      while (i < nGrams) {
        // h_{i} = (h_{i-1} − v[i-1]·B^(k-1))·B + v[i+k-1]  (mod P);
        // |h − v·bk1| < 128·P and ·B keeps it well under 2^63
        h = ((h - vals(i - 1) * bk1) % P * B + vals(i + k - 1)) % P
        if (h < 0) h += P
        out(i) = h
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Native whole-stage-codegen polynomial rolling hash over a string
  * column: all char `k`-gram hashes as one `array<bigint>`.
  *
  * Replaces the interpreted HOF form that evaluated a k-term
  * `substr`+`ascii` expression tree per character position (Catalyst
  * does not codegen HOF lambdas; measured 32 s for the CDC boundary
  * scan at sf0.1 — 15% of the whole suite). The incremental kernel
  * ([[RollingHash.compute]]) reads each character once; same
  * constants, same values, so the DuckDB oracles built from
  * [[TextFunctions.polyPowers]] are unchanged. Consumers: winnowing
  * fingerprints (k=8) and content-defined chunking boundaries (k=16).
  */
case class RollingHashExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case _: StringType =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName window must be >= 1, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHash.compute($c, $k);")

  override protected def withNewChildInternal(
      newChild: Expression): RollingHashExpr = copy(child = newChild)

  override def prettyName: String = "graft_rolling_hash"
}
