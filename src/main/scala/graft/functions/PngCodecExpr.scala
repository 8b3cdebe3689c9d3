package graft.functions

import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._

/** A REAL COMPRESSED image decode rung — PNG (8-bit truecolor), the
  * first format in the multimodal family whose pixels do not sit as
  * plain bytes in the container: the JDK ships zlib
  * (`java.util.zip.Inflater`/`Deflater`), so a spec-honest
  * inflate + unfilter decode needs no external media library.
  *
  * [[PngEncodeExpr]] renders the SAME closed-form test pattern as the
  * BMP rung ([[BmpCodec.pixel]], so the two containers are
  * cross-checkable pixel-for-pixel) into a spec-complete PNG:
  * signature, IHDR, IDAT (zlib-deflated scanlines, each row carrying
  * a DIFFERENT filter type cycling None/Sub/Up/Average/Paeth so every
  * unfilter path is exercised, split across TWO IDAT chunks so
  * payload concatenation is exercised), IEND, with real CRC-32 per
  * chunk. [[PngDecodeExpr]] parses like a real reader must: signature
  * + chunk walk with CRC VERIFICATION, IHDR validation (8-bit color
  * type 2, no interlace), multi-IDAT concatenation, zlib inflate,
  * then per-row unfiltering (all five filter types, Paeth predictor
  * included) into per-channel pixel sums — null for anything
  * malformed, truncated, CRC-corrupt, or an unsupported profile.
  *
  * The pixel pattern is closed-form, so the DuckDB oracle reproduces
  * the expected stats analytically (m_png_decode) — the whole
  * deflate→bytes→inflate→unfilter round trip is hash-checked without
  * DuckDB ever touching a PNG. The COMPRESSED byte size is the one
  * thing deliberately absent from the driver row: deflate output is
  * an implementation detail of the zlib build, not part of the
  * decode contract (PngCodecSpec asserts the round trip instead).
  *
  * Both expressions participate in whole-stage codegen as a single
  * static call per row.
  */
object PngCodec {

  private val Signature: Array[Byte] =
    Array(0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n')

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bit_depth", IntegerType, nullable = false),
    StructField("n_pixels", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Raw (unfiltered) RGB scanlines of the test pattern, top-down. */
  private def rawScanlines(docId: Long, w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](h * w * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        out(o) = BmpCodec.pixel(docId, x, y, 0).toByte     // R
        out(o + 1) = BmpCodec.pixel(docId, x, y, 1).toByte // G
        out(o + 2) = BmpCodec.pixel(docId, x, y, 2).toByte // B
        x += 1
      }
      y += 1
    }
    out
  }

  /** Emit a spec-complete 8-bit truecolor PNG of the shared test
    * pattern ([[BmpCodec.width]]/[[BmpCodec.height]]/[[BmpCodec.pixel]]),
    * row `y` filtered with type `y % 5`. */
  def encode(docId: Long): Array[Byte] = {
    val w = BmpCodec.width(docId); val h = BmpCodec.height(docId)
    val raw = rawScanlines(docId, w, h)
    val rowLen = w * 3
    // apply per-row filters: each stored row = 1 filter byte + rowLen
    val filtered = new Array[Byte](h * (rowLen + 1))
    var y = 0
    while (y < h) {
      val ft = y % 5
      filtered(y * (rowLen + 1)) = ft.toByte
      var i = 0
      while (i < rowLen) {
        val cur = raw(y * rowLen + i) & 0xFF
        val left = if (i >= 3) raw(y * rowLen + i - 3) & 0xFF else 0
        val up = if (y > 0) raw((y - 1) * rowLen + i) & 0xFF else 0
        val upLeft =
          if (y > 0 && i >= 3) raw((y - 1) * rowLen + i - 3) & 0xFF else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, upLeft)
        }
        filtered(y * (rowLen + 1) + 1 + i) = ((cur - pred) & 0xFF).toByte
        i += 1
      }
      y += 1
    }
    // zlib-deflate the filtered stream
    val defl = new Deflater()
    defl.setInput(filtered); defl.finish()
    val zbuf = new Array[Byte](filtered.length + 64)
    var zlen = 0
    while (!defl.finished()) {
      val n = defl.deflate(zbuf, zlen, zbuf.length - zlen)
      zlen += n
      if (zlen == zbuf.length && !defl.finished())
        return null // cannot happen for this data; defensive
    }
    defl.end()
    // assemble chunks; IDAT split in two so readers must concatenate
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Signature, 0, Signature.length)
    def chunk(typ: String, data: Array[Byte], off: Int, len: Int): Unit = {
      val hdr = new Array[Byte](4)
      hdr(0) = ((len >> 24) & 0xFF).toByte; hdr(1) = ((len >> 16) & 0xFF).toByte
      hdr(2) = ((len >> 8) & 0xFF).toByte; hdr(3) = (len & 0xFF).toByte
      bos.write(hdr, 0, 4)
      val tb = typ.getBytes("US-ASCII")
      bos.write(tb, 0, 4)
      if (len > 0) bos.write(data, off, len)
      val crc = new CRC32()
      crc.update(tb, 0, 4)
      if (len > 0) crc.update(data, off, len)
      val cv = crc.getValue.toInt
      val cb = new Array[Byte](4)
      cb(0) = ((cv >> 24) & 0xFF).toByte; cb(1) = ((cv >> 16) & 0xFF).toByte
      cb(2) = ((cv >> 8) & 0xFF).toByte; cb(3) = (cv & 0xFF).toByte
      bos.write(cb, 0, 4)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((w >> 24) & 0xFF).toByte; ihdr(1) = ((w >> 16) & 0xFF).toByte
    ihdr(2) = ((w >> 8) & 0xFF).toByte; ihdr(3) = (w & 0xFF).toByte
    ihdr(4) = ((h >> 24) & 0xFF).toByte; ihdr(5) = ((h >> 16) & 0xFF).toByte
    ihdr(6) = ((h >> 8) & 0xFF).toByte; ihdr(7) = (h & 0xFF).toByte
    ihdr(8) = 8   // bit depth
    ihdr(9) = 2   // color type: truecolor RGB
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0 // deflate, adaptive, no interlace
    chunk("IHDR", ihdr, 0, 13)
    val split = zlen / 2
    chunk("IDAT", zbuf, 0, split)
    chunk("IDAT", zbuf, split, zlen - split)
    chunk("IEND", Array.emptyByteArray, 0, 0)
    bos.toByteArray
  }

  /** Parse + CRC-verify the container, inflate, unfilter, and sum each
    * channel. Null (never an exception) for anything that is not a
    * well-formed 8-bit truecolor non-interlaced PNG — a lake-scale
    * decode stage skips bad blobs. */
  def decode(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < Signature.length + 12) return null
    var i = 0
    while (i < Signature.length) {
      if (b(i) != Signature(i)) return null
      i += 1
    }
    def be32(off: Int): Int =
      ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
        ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)
    var off = Signature.length
    var w = -1; var h = -1; var bitDepth = -1; var colorType = -1
    var interlace = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd) {
      if (off + 8 > b.length) return null
      val len = be32(off)
      if (len < 0 || off + 12 + len.toLong > b.length) return null
      val typ = new String(b, off + 4, 4, "US-ASCII")
      // CRC check: a real reader rejects a corrupted chunk
      val crc = new CRC32()
      crc.update(b, off + 4, 4 + len)
      if (crc.getValue.toInt != be32(off + 8 + len)) return null
      typ match {
        case "IHDR" =>
          if (len != 13) return null
          w = be32(off + 8); h = be32(off + 12)
          bitDepth = b(off + 16) & 0xFF; colorType = b(off + 17) & 0xFF
          interlace = b(off + 20) & 0xFF
        case "IDAT" => idat.write(b, off + 8, len)
        case "IEND" => sawEnd = true
        case _      => () // ancillary chunks are skippable by contract
      }
      off += 12 + len
    }
    if (w <= 0 || h <= 0 || bitDepth != 8 || colorType != 2 ||
      interlace != 0) return null
    if (w.toLong * h * 3 + h > Int.MaxValue - 8) return null // absurd dims
    val rowLen = w * 3
    val expect = h * (rowLen + 1)
    val raw = new Array[Byte](expect)
    val infl = new Inflater()
    infl.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < expect && !infl.finished()) {
        val n = infl.inflate(raw, got, expect - got)
        // truncated stream, or a preset-dictionary stream (never
        // valid zlib-in-PNG): bail rather than spin
        if (n == 0 && (infl.needsInput() || infl.needsDictionary()))
          return null
        got += n
      }
    } catch { case _: java.util.zip.DataFormatException => return null }
    finally infl.end()
    if (got != expect) return null
    // unfilter in place into `prev`/`cur` raw rows, summing channels
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    val prev = new Array[Int](rowLen)
    val cur = new Array[Int](rowLen)
    var y = 0
    while (y < h) {
      val ft = raw(y * (rowLen + 1)) & 0xFF
      if (ft > 4) return null
      var x = 0
      while (x < rowLen) {
        val f = raw(y * (rowLen + 1) + 1 + x) & 0xFF
        val left = if (x >= 3) cur(x - 3) else 0
        val up = if (y > 0) prev(x) else 0
        val upLeft = if (y > 0 && x >= 3) prev(x - 3) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case _ => paeth(left, up, upLeft)
        }
        cur(x) = (f + pred) & 0xFF
        x += 1
      }
      var p = 0
      while (p < w) {
        sumR += cur(p * 3); sumG += cur(p * 3 + 1); sumB += cur(p * 3 + 2)
        p += 1
      }
      System.arraycopy(cur, 0, prev, 0, rowLen)
      y += 1
    }
    new GenericInternalRow(Array[Any](
      w, h, bitDepth, w.toLong * h, sumR, sumG, sumB))
  }
}

/** `bigint doc_id` → binary PNG payload (see [[PngCodec.encode]]). */
case class PngEncodeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType

  override def nullSafeEval(v: Any): Any =
    PngCodec.encode(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PngCodec.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): PngEncodeExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_png_encode"
}

/** binary PNG payload → struct of header fields + per-channel pixel
  * sums; null for non-PNG/corrupt input (see [[PngCodec.decode]]). */
case class PngDecodeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.simpleString}")
  }

  override def dataType: DataType = PngCodec.schema

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    PngCodec.decode(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.PngCodec.decode($c);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PngDecodeExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_png_decode"
}
