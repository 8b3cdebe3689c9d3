package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._

/** The audio twin of [[BmpCodec]]: a REAL decode rung for the one
  * audio container that needs no media library — RIFF/WAVE with raw
  * 16-bit PCM — encoded and decoded with pure byte arithmetic.
  *
  * [[WavEncodeExpr]] renders a deterministic stereo test signal per
  * `doc_id` (varying frame counts; signed sample values spanning both
  * polarities so the decoder's two's-complement handling is actually
  * exercised) into a spec-complete container, deliberately including
  * a junk `LIST` chunk between `fmt ` and `data`.
  * [[WavDecodeExpr]] parses the container the way a real reader must:
  * RIFF magic + WAVE form type, then a CHUNK WALK (id + little-endian
  * size, word-aligned skip over unknown chunks — the junk chunk makes
  * a hardcoded-offset "parser" fail), `fmt ` field validation
  * (PCM/16-bit only), and a signed little-endian int16 scan of
  * `data`, returning per-channel sums and the absolute peak; null for
  * anything malformed. The sample function is closed-form, so the
  * DuckDB oracle reproduces the expected stats analytically and the
  * whole encode→bytes→decode round trip is hash-checked.
  *
  * Both expressions participate in whole-stage codegen as a single
  * static call per row.
  */
object WavCodec {

  final val SampleRate = 8000
  final val Channels = 2
  final val BitsPerSample = 16
  /** Modulus for the test signal: prime, > 2^10, so samples cover
    * [-1001, +1001] and sign-extension bugs cannot hide. */
  final val SampleMod = 2003

  // floorMod keeps frame counts/samples well-defined for ANY doc_id —
  // a negative id through the registered SQL function must yield a
  // well-formed container (plain % would give negative frames() and a
  // NegativeArraySizeException); identical to % for the non-negative
  // ids the oracles enumerate.
  def frames(docId: Long): Int = (64 + Math.floorMod(docId, 5L) * 16).toInt
  /** Sample for frame i, channel c (0 = left, 1 = right) ∈ [-1001, 1001]. */
  def sample(docId: Long, i: Int, c: Int): Int =
    (Math.floorMod(docId * 31 + i.toLong * 17 + c.toLong * 7,
      SampleMod.toLong) - 1001).toInt

  private val junk = "graft junk chunk".getBytes("US-ASCII") // even length

  def encode(docId: Long): Array[Byte] = {
    val n = frames(docId)
    val dataLen = n * Channels * (BitsPerSample / 8)
    val junkChunkLen = 8 + junk.length
    // RIFF(12) + fmt(8+16) + junk chunk + data(8+dataLen)
    val riffLen = 4 + 24 + junkChunkLen + 8 + dataLen
    val b = new Array[Byte](8 + riffLen)
    var o = 0
    def ascii(s: String): Unit = { s.foreach { ch => b(o) = ch.toByte; o += 1 } }
    def le32(v: Int): Unit = {
      b(o) = (v & 0xFF).toByte; b(o + 1) = ((v >> 8) & 0xFF).toByte
      b(o + 2) = ((v >> 16) & 0xFF).toByte; b(o + 3) = ((v >> 24) & 0xFF).toByte
      o += 4
    }
    def le16(v: Int): Unit = {
      b(o) = (v & 0xFF).toByte; b(o + 1) = ((v >> 8) & 0xFF).toByte; o += 2
    }
    ascii("RIFF"); le32(riffLen); ascii("WAVE")
    ascii("fmt "); le32(16)
    le16(1) // PCM
    le16(Channels)
    le32(SampleRate)
    le32(SampleRate * Channels * (BitsPerSample / 8)) // byte rate
    le16(Channels * (BitsPerSample / 8)) // block align
    le16(BitsPerSample)
    ascii("LIST"); le32(junk.length); junk.foreach { j => b(o) = j; o += 1 }
    ascii("data"); le32(dataLen)
    var i = 0
    while (i < n) {
      le16(sample(docId, i, 0) & 0xFFFF)
      le16(sample(docId, i, 1) & 0xFFFF)
      i += 1
    }
    b
  }

  val schema: StructType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("sum_l", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false)))

  /** Chunk-walking PCM decode; null (not an exception) on anything
    * that is not a parseable 16-bit PCM RIFF/WAVE. */
  def decode(b: Array[Byte]): InternalRow = {
    def u8(i: Int): Int = b(i) & 0xFF
    def le32(off: Int): Int =
      u8(off) | (u8(off + 1) << 8) | (u8(off + 2) << 16) | (u8(off + 3) << 24)
    def le16(off: Int): Int = u8(off) | (u8(off + 1) << 8)
    def s16(off: Int): Int = le16(off).toShort.toInt // sign-extend
    def tag(off: Int): String =
      if (off + 4 > b.length) ""
      else new String(b, off, 4, "US-ASCII")
    if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return null
    val riffEnd = math.min(b.length.toLong, 8L + le32(4))
    // walk chunks: [id:4][size:4][payload:size][pad to even]
    var off = 12L
    var fmtOff = -1L; var fmtLen = -1; var dataOff = -1L; var dataLen = -1
    while (off + 8 <= riffEnd && (fmtOff < 0 || dataOff < 0)) {
      val id = tag(off.toInt)
      val size = le32(off.toInt + 4)
      if (size < 0 || off + 8 + size > riffEnd) return null
      if (id == "fmt ") { fmtOff = off + 8; fmtLen = size }
      else if (id == "data") { dataOff = off + 8; dataLen = size }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (fmtOff < 0 || dataOff < 0 || dataLen < 0) return null
    // the fmt fields read below span 16 bytes: a truncated fmt chunk
    // (declared size < 16, legal as the last chunk in the file) must
    // be rejected, not read past — null-on-malformed, never a throw
    if (fmtLen < 16) return null
    // implied by the walk's riffEnd bound (riffEnd <= b.length), made
    // explicit: the sample scan below must stay inside the buffer
    if (dataOff + dataLen > b.length) return null
    val audioFormat = le16(fmtOff.toInt)
    val channels = le16(fmtOff.toInt + 2)
    val sampleRate = le32(fmtOff.toInt + 4)
    val bits = le16(fmtOff.toInt + 14)
    if (audioFormat != 1 || bits != 16 || channels < 1 || channels > 2)
      return null
    val bytesPerFrame = channels * 2
    if (dataLen % bytesPerFrame != 0) return null
    val n = dataLen / bytesPerFrame
    var sumL = 0L; var sumR = 0L; var peak = 0
    var i = 0
    while (i < n) {
      val base = dataOff.toInt + i * bytesPerFrame
      val l = s16(base)
      sumL += l
      peak = math.max(peak, math.abs(l))
      if (channels == 2) {
        val r = s16(base + 2)
        sumR += r
        peak = math.max(peak, math.abs(r))
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      channels, sampleRate, bits, n.toLong, sumL, sumR, peak))
  }

  /** REAL decimation: chunk-walk + validate exactly like [[decode]],
    * keep every `factor`-th frame, and re-encode a minimal
    * spec-complete RIFF/WAVE (fmt + data only — unknown chunks are
    * dropped, as a normalizing transcoder does) with the sample rate
    * divided by `factor` — the integer downsample an audio lake runs
    * to normalize rates before feature extraction. Null on malformed
    * input or a non-positive factor. */
  def resample(b: Array[Byte], factor: Int): Array[Byte] = {
    def u8(i: Int): Int = b(i) & 0xFF
    def le32r(off: Int): Int =
      u8(off) | (u8(off + 1) << 8) | (u8(off + 2) << 16) | (u8(off + 3) << 24)
    def le16r(off: Int): Int = u8(off) | (u8(off + 1) << 8)
    def tag(off: Int): String =
      if (off + 4 > b.length) ""
      else new String(b, off, 4, "US-ASCII")
    if (factor <= 0) return null
    if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return null
    val riffEnd = math.min(b.length.toLong, 8L + le32r(4))
    var off = 12L
    var fmtOff = -1L; var fmtLen = -1; var dataOff = -1L; var dataLen = -1
    while (off + 8 <= riffEnd && (fmtOff < 0 || dataOff < 0)) {
      val id = tag(off.toInt)
      val size = le32r(off.toInt + 4)
      if (size < 0 || off + 8 + size > riffEnd) return null
      if (id == "fmt ") { fmtOff = off + 8; fmtLen = size }
      else if (id == "data") { dataOff = off + 8; dataLen = size }
      off += 8 + size + (size & 1)
    }
    if (fmtOff < 0 || dataOff < 0 || dataLen < 0) return null
    if (fmtLen < 16) return null // truncated fmt chunk: reject, don't overread
    if (dataOff + dataLen > b.length) return null
    val audioFormat = le16r(fmtOff.toInt)
    val channels = le16r(fmtOff.toInt + 2)
    val sampleRate = le32r(fmtOff.toInt + 4)
    val bits = le16r(fmtOff.toInt + 14)
    if (audioFormat != 1 || bits != 16 || channels < 1 || channels > 2)
      return null
    val bytesPerFrame = channels * 2
    if (dataLen % bytesPerFrame != 0) return null
    val n = dataLen / bytesPerFrame
    val kept = (n + factor - 1) / factor
    val outDataLen = kept * bytesPerFrame
    val riffLen = 4 + 24 + 8 + outDataLen
    val out = new Array[Byte](8 + riffLen)
    var o = 0
    def ascii(s: String): Unit = { s.foreach { ch => out(o) = ch.toByte; o += 1 } }
    def le32(v: Int): Unit = {
      out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
      out(o + 2) = ((v >> 16) & 0xFF).toByte; out(o + 3) = ((v >> 24) & 0xFF).toByte
      o += 4
    }
    def le16(v: Int): Unit = {
      out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte; o += 2
    }
    ascii("RIFF"); le32(riffLen); ascii("WAVE")
    ascii("fmt "); le32(16)
    le16(1); le16(channels)
    le32(sampleRate / factor)
    le32((sampleRate / factor) * channels * 2)
    le16(channels * 2); le16(16)
    ascii("data"); le32(outDataLen)
    var j = 0
    while (j < kept) {
      System.arraycopy(b, dataOff.toInt + j * factor * bytesPerFrame,
        out, o, bytesPerFrame)
      o += bytesPerFrame
      j += 1
    }
    out
  }

  /** REAL audio feature extraction over the chunk-walked decode — the
    * audio twin of [[BmpCodec.pool]]: the PCM frames are split into
    * `nBands` equal time bands (band of frame i = i·nBands/n, the
    * same grid rule as the image pool) and each (band, channel) cell
    * emits the fixed-point mean of ABSOLUTE sample values,
    * sum(|s|)·1000/count — the energy-envelope descriptor a learned
    * audio embedding replaces 1:1. Returns `array<bigint>` of length
    * nBands·channels ordered band-major (band·channels + c); null on
    * malformed input, non-positive nBands, or fewer frames than
    * bands (an empty band would make the mean undefined). */
  def pool(b: Array[Byte], nBands: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    def u8(i: Int): Int = b(i) & 0xFF
    def le32(off: Int): Int =
      u8(off) | (u8(off + 1) << 8) | (u8(off + 2) << 16) | (u8(off + 3) << 24)
    def le16(off: Int): Int = u8(off) | (u8(off + 1) << 8)
    def s16(off: Int): Int = le16(off).toShort.toInt
    def tag(off: Int): String =
      if (off + 4 > b.length) ""
      else new String(b, off, 4, "US-ASCII")
    if (nBands <= 0) return null
    if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return null
    val riffEnd = math.min(b.length.toLong, 8L + le32(4))
    var off = 12L
    var fmtOff = -1L; var fmtLen = -1; var dataOff = -1L; var dataLen = -1
    while (off + 8 <= riffEnd && (fmtOff < 0 || dataOff < 0)) {
      val id = tag(off.toInt)
      val size = le32(off.toInt + 4)
      if (size < 0 || off + 8 + size > riffEnd) return null
      if (id == "fmt ") { fmtOff = off + 8; fmtLen = size }
      else if (id == "data") { dataOff = off + 8; dataLen = size }
      off += 8 + size + (size & 1)
    }
    if (fmtOff < 0 || dataOff < 0 || dataLen < 0) return null
    if (fmtLen < 16) return null
    if (dataOff + dataLen > b.length) return null
    val audioFormat = le16(fmtOff.toInt)
    val channels = le16(fmtOff.toInt + 2)
    val bits = le16(fmtOff.toInt + 14)
    if (audioFormat != 1 || bits != 16 || channels < 1 || channels > 2)
      return null
    val bytesPerFrame = channels * 2
    if (dataLen % bytesPerFrame != 0) return null
    val n = dataLen / bytesPerFrame
    if (n < nBands) return null
    val sums = new Array[Long](nBands * channels)
    val counts = new Array[Long](nBands)
    var i = 0
    while (i < n) {
      val band = (i.toLong * nBands / n).toInt
      val base = dataOff.toInt + i * bytesPerFrame
      sums(band * channels) += math.abs(s16(base))
      if (channels == 2) sums(band * channels + 1) += math.abs(s16(base + 2))
      counts(band) += 1
      i += 1
    }
    val feats = new Array[Long](nBands * channels)
    var bi = 0
    while (bi < nBands) {
      var c = 0
      while (c < channels) {
        feats(bi * channels + c) = sums(bi * channels + c) * 1000L / counts(bi)
        c += 1
      }
      bi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(feats)
  }
}

/** `bigint doc_id` → binary WAV payload (see [[WavCodec.encode]]). */
case class WavEncodeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType

  override def nullSafeEval(v: Any): Any =
    WavCodec.encode(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WavCodec.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): WavEncodeExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_wav_encode"
}

/** binary WAV payload → struct of format fields + per-channel sums +
  * peak; null for non-WAV input (see [[WavCodec.decode]]). */
case class WavDecodeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.simpleString}")
  }

  override def dataType: DataType = WavCodec.schema

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    WavCodec.decode(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.WavCodec.decode($c);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WavDecodeExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_wav_decode"
}

/** binary WAV payload → every-`factor`-th-frame decimated binary WAV
  * at rate/`factor`; null for non-WAV input (see
  * [[WavCodec.resample]]). The factor is a plan-time constant, so
  * codegen emits one static call per row. */
case class WavResampleExpr(child: Expression, factor: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (factor <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName factor must be positive, got $factor")
    else child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary argument, got ${other.simpleString}")
    }

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    WavCodec.resample(v.asInstanceOf[Array[Byte]], factor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.WavCodec.resample($c, $factor);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WavResampleExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_wav_resample"
}

/** binary WAV payload → `nBands·channels`-dim bigint banded
  * mean-|PCM| feature vector; null for non-WAV input (see
  * [[WavCodec.pool]]). The band count is a plan-time constant, so
  * codegen emits one static call per row. */
case class WavPoolExpr(child: Expression, nBands: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (nBands <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName band count must be positive, got $nBands")
    else child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary argument, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    WavCodec.pool(v.asInstanceOf[Array[Byte]], nBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.WavCodec.pool($c, $nBands);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WavPoolExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_wav_pool"
}
