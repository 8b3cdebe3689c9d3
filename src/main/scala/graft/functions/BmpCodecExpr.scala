package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** A REAL image decode rung for the multimodal pipeline (replacing the
  * honest-but-fake `MultimodalPipeline.decodeStub` for the one format
  * that needs no media library): uncompressed 24-bit Windows BMP,
  * encoded and decoded with pure byte arithmetic in the JVM.
  *
  * [[BmpEncodeExpr]] renders a deterministic test-pattern bitmap per
  * `doc_id` (varying width 4–8 and height 5–8, so every row-padding
  * case 0–3 bytes is exercised); [[BmpDecodeExpr]] parses the actual
  * container — magic, little-endian header fields, pixel-array offset,
  * 4-byte row stride, bottom-up (or top-down, negative-height) row
  * order, BGR channel order — and returns per-channel pixel sums, or
  * null for anything that is not a parseable uncompressed 24bpp BMP.
  * Because the pixel function is closed-form, the DuckDB oracle can
  * reproduce the expected stats analytically, so the whole
  * encode→bytes→decode round trip (offsets, stride, padding, channel
  * order) is hash-checked without DuckDB ever touching a BMP.
  *
  * Both expressions participate in whole-stage codegen as a single
  * static call per row (no interpreted-projection fallback).
  */
object BmpCodec {

  /** Modulus for the test-pattern pixel value: a prime > 2^7, so
    * pixel bytes cover (almost) the full unsigned 0..255 range and the
    * decoder's signed-byte handling (`& 0xFF`) is actually exercised. */
  final val PixelMod = 251
  final val HeaderLen = 54

  // floorMod keeps the derived dimensions/values in range for ANY
  // doc_id (a negative id through the registered SQL function must
  // yield a well-formed container, not a degenerate one); identical
  // to % for the non-negative ids the oracles enumerate.
  def width(docId: Long): Int = (4 + Math.floorMod(docId, 5L)).toInt
  def height(docId: Long): Int = (5 + Math.floorMod(docId, 4L)).toInt
  /** c: 0=R, 1=G, 2=B; (x, y) with y=0 the TOP image row. */
  def pixel(docId: Long, x: Int, y: Int, c: Int): Int =
    Math.floorMod(docId * 7 + y * 31 + x * 13 + c * 5, PixelMod.toLong).toInt
  /** Callers must bound w first ([[maxWidth]]): stride overflows Int
    * beyond it. */
  def stride(w: Int): Int = ((w * 3 + 3) / 4) * 4
  /** Largest header width for which stride() cannot overflow Int. A
    * crafted header beyond it must be REJECTED before stride is
    * computed — the negative stride would otherwise pass the Long
    * bounds check and crash the pixel loop instead of returning the
    * documented null. */
  final val maxWidth: Int = (Int.MaxValue - 3) / 3

  /** Emit a spec-complete BITMAPFILEHEADER + BITMAPINFOHEADER + padded
    * bottom-up BGR pixel array (biSizeImage left 0, legal for BI_RGB). */
  def encode(docId: Long): Array[Byte] = {
    val w = width(docId); val h = height(docId)
    val st = stride(w)
    val size = HeaderLen + st * h
    val b = new Array[Byte](size)
    def le32(off: Int, v: Int): Unit = {
      b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
      b(off + 2) = ((v >> 16) & 0xFF).toByte; b(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    le32(2, size); le32(10, HeaderLen)
    le32(14, 40); le32(18, w); le32(22, h)
    le16(26, 1); le16(28, 24)
    var sy = 0
    while (sy < h) {
      val y = h - 1 - sy // bottom-up storage
      var x = 0
      while (x < w) {
        val o = HeaderLen + sy * st + x * 3
        b(o) = pixel(docId, x, y, 2).toByte     // B
        b(o + 1) = pixel(docId, x, y, 1).toByte // G
        b(o + 2) = pixel(docId, x, y, 0).toByte // R
        x += 1
      }
      sy += 1
    }
    b
  }

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bpp", IntegerType, nullable = false),
    StructField("n_pixels", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  /** Parse the container and sum each channel over all pixels.
    * Returns null (not an exception) for malformed/unsupported input —
    * a lake-scale decode stage must skip bad blobs, not die. */
  def decode(b: Array[Byte]): InternalRow = {
    def u8(i: Int): Int = b(i) & 0xFF
    def le32(off: Int): Int =
      u8(off) | (u8(off + 1) << 8) | (u8(off + 2) << 16) | (u8(off + 3) << 24)
    def le16(off: Int): Int = u8(off) | (u8(off + 1) << 8)
    if (b.length < HeaderLen || b(0) != 'B' || b(1) != 'M') return null
    val pixOff = le32(10)
    val w = le32(18)
    val hRaw = le32(22) // negative = top-down storage
    val bpp = le16(28)
    val compression = le32(30)
    val h = math.abs(hRaw) // Int.MinValue stays negative -> h <= 0 rejects
    if (bpp != 24 || compression != 0 || w <= 0 || w > maxWidth || h <= 0)
      return null
    val st = stride(w)
    if (pixOff < HeaderLen || pixOff.toLong + st.toLong * h > b.length) return null
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var sy = 0
    while (sy < h) {
      var x = 0
      while (x < w) {
        val o = pixOff + sy * st + x * 3
        sumB += u8(o); sumG += u8(o + 1); sumR += u8(o + 2)
        x += 1
      }
      sy += 1
    }
    new GenericInternalRow(Array[Any](
      w, h, bpp, w.toLong * h, sumR, sumG, sumB))
  }

  /** REAL feature extraction: parse the container (same validation as
    * [[decode]]) and MEAN-POOL the pixels over a `gw`×`gh` cell grid —
    * source pixel (x, y) (top-row coordinates) contributes to cell
    * (⌊x·gw/w⌋, ⌊y·gh/h⌋), the standard pooling assignment — into a
    * fixed `gw·gh·3`-dim integer feature vector: feature index
    * (cy·gw + cx)·3 + c, value ⌊cellSum·1000 / cellCount⌋ (the
    * per-channel cell mean on a fixed 1e-3 integer grid, so the value
    * is EXACT cross-engine — no float accumulation anywhere). Handles
    * both row orders; null on malformed input or when the image is
    * smaller than the grid (an empty cell has no mean). */
  def pool(b: Array[Byte], gw: Int, gh: Int): GenericArrayData = {
    def u8(i: Int): Int = b(i) & 0xFF
    def le32(off: Int): Int =
      u8(off) | (u8(off + 1) << 8) | (u8(off + 2) << 16) | (u8(off + 3) << 24)
    def le16(off: Int): Int = u8(off) | (u8(off + 1) << 8)
    if (gw <= 0 || gh <= 0) return null
    if (b.length < HeaderLen || b(0) != 'B' || b(1) != 'M') return null
    val pixOff = le32(10)
    val w = le32(18)
    val hRaw = le32(22)
    val bpp = le16(28)
    val compression = le32(30)
    val h = math.abs(hRaw)
    if (bpp != 24 || compression != 0 || w <= 0 || w > maxWidth || h <= 0)
      return null
    if (w < gw || h < gh) return null // a grid cell would be empty
    val st = stride(w)
    if (pixOff < HeaderLen || pixOff.toLong + st.toLong * h > b.length) return null
    val cells = gw * gh
    val sums = new Array[Long](cells * 3)
    val counts = new Array[Long](cells)
    var sy = 0
    while (sy < h) {
      val y = if (hRaw > 0) h - 1 - sy else sy // top-row coordinate
      val cy = y * gh / h
      var x = 0
      while (x < w) {
        val cell = cy * gw + x * gw / w
        val o = pixOff + sy * st + x * 3
        sums(cell * 3 + 2) += u8(o)     // B
        sums(cell * 3 + 1) += u8(o + 1) // G
        sums(cell * 3) += u8(o + 2)     // R
        counts(cell) += 1
        x += 1
      }
      sy += 1
    }
    val feats = new Array[Long](cells * 3)
    var ci = 0
    while (ci < cells) {
      var c = 0
      while (c < 3) {
        feats(ci * 3 + c) = sums(ci * 3 + c) * 1000L / counts(ci)
        c += 1
      }
      ci += 1
    }
    new GenericArrayData(feats)
  }

  /** REAL resize: parse the container (same validation as [[decode]]),
    * nearest-neighbor resample to outW×outH — source pixel
    * (⌊x·w/outW⌋, ⌊y·h/outH⌋) in top-row coordinates, the classic NN
    * mapping — and re-encode a spec-complete bottom-up BMP. Handles
    * both source row orders (positive height bottom-up, negative
    * top-down) and re-pads rows to the 4-byte stride. Null on
    * malformed input, like decode: a lake-scale thumbnail stage skips
    * bad blobs. */
  def resize(b: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    def u8(i: Int): Int = b(i) & 0xFF
    def le32r(off: Int): Int =
      u8(off) | (u8(off + 1) << 8) | (u8(off + 2) << 16) | (u8(off + 3) << 24)
    def le16r(off: Int): Int = u8(off) | (u8(off + 1) << 8)
    if (outW <= 0 || outH <= 0) return null
    if (b.length < HeaderLen || b(0) != 'B' || b(1) != 'M') return null
    val pixOff = le32r(10)
    val w = le32r(18)
    val hRaw = le32r(22)
    val bpp = le16r(28)
    val compression = le32r(30)
    val h = math.abs(hRaw) // Int.MinValue stays negative -> h <= 0 rejects
    if (bpp != 24 || compression != 0 || w <= 0 || w > maxWidth || h <= 0)
      return null
    val srcSt = stride(w)
    if (pixOff < HeaderLen || pixOff.toLong + srcSt.toLong * h > b.length) return null
    val st = stride(outW)
    val size = HeaderLen + st * outH
    val out = new Array[Byte](size)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
      out(off + 2) = ((v >> 16) & 0xFF).toByte; out(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, size); le32(10, HeaderLen)
    le32(14, 40); le32(18, outW); le32(22, outH)
    le16(26, 1); le16(28, 24)
    var sy = 0
    while (sy < outH) {
      val y = outH - 1 - sy // output stored bottom-up; y = top coord
      val srcY = y * h / outH
      val srcRow = if (hRaw > 0) h - 1 - srcY else srcY
      var x = 0
      while (x < outW) {
        val srcX = x * w / outW
        val so = pixOff + srcRow * srcSt + srcX * 3
        val oo = HeaderLen + sy * st + x * 3
        out(oo) = b(so); out(oo + 1) = b(so + 1); out(oo + 2) = b(so + 2)
        x += 1
      }
      sy += 1
    }
    out
  }
}

/** `bigint doc_id` → binary BMP payload (see [[BmpCodec.encode]]). */
case class BmpEncodeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType

  override def nullSafeEval(v: Any): Any =
    BmpCodec.encode(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BmpCodec.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): BmpEncodeExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_bmp_encode"
}

/** binary BMP payload → struct of header fields + per-channel pixel
  * sums; null for non-BMP input (see [[BmpCodec.decode]]). */
case class BmpDecodeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.simpleString}")
  }

  override def dataType: DataType = BmpCodec.schema

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    BmpCodec.decode(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.BmpCodec.decode($c);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): BmpDecodeExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_bmp_decode"
}

/** binary BMP payload → nearest-neighbor-resampled `outW`×`outH`
  * binary BMP; null for non-BMP input (see [[BmpCodec.resize]]). The
  * target shape is a plan-time constant (like a thumbnail stage's
  * fixed output size), so codegen emits one static call per row. */
case class BmpResizeExpr(child: Expression, outW: Int, outH: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (outW <= 0 || outH <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName target shape must be positive, got ${outW}x$outH")
    else child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary argument, got ${other.simpleString}")
    }

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    BmpCodec.resize(v.asInstanceOf[Array[Byte]], outW, outH)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.BmpCodec.resize($c, $outW, $outH);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): BmpResizeExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_bmp_resize"
}

/** binary BMP payload → `gw·gh·3`-dim bigint feature vector (the
  * per-cell per-channel fixed-point means — see [[BmpCodec.pool]]);
  * null for non-BMP input or an image smaller than the grid. The grid
  * shape is a plan-time constant (a feature extractor's output
  * dimensionality is part of the model contract), so codegen emits
  * one static call per row. */
case class BmpPoolExpr(child: Expression, gridW: Int, gridH: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (gridW <= 0 || gridH <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName grid shape must be positive, got ${gridW}x$gridH")
    else child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary argument, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    BmpCodec.pool(v.asInstanceOf[Array[Byte]], gridW, gridH)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.BmpCodec.pool($c, $gridW, $gridH);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): BmpPoolExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_bmp_pool"
}
