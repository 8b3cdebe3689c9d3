package graft

/** The compressed-decode rung's round-trip contract. The driver row
  * (m_png_decode) hash-checks the decoded STATS against the
  * closed-form oracle; this spec covers what the oracle cannot see —
  * the container itself: byte-level round-trip equivalence with the
  * BMP twin (same pixel pattern, two containers), CRC rejection, and
  * truncation/profile guards. */
class PngCodecSpec extends SparkTestBase {

  test("PNG round trip recovers exactly the BMP twin's pixel stats " +
      "(deflate -> inflate -> unfilter, all five filter types)") {
    import graft.functions.{BmpCodec, PngCodec}
    for (id <- 0L until 40L) { // heights 5-8 cycle all filter rows
      val png = PngCodec.decode(PngCodec.encode(id))
      val bmp = BmpCodec.decode(BmpCodec.encode(id))
      assert(png != null && bmp != null, s"doc $id")
      assert(png.getInt(0) == bmp.getInt(0), s"width of $id")
      assert(png.getInt(1) == bmp.getInt(1), s"height of $id")
      assert(png.getInt(2) == 8, s"bit depth of $id")
      assert(png.getLong(3) == bmp.getLong(3), s"n_pixels of $id")
      assert(png.getLong(4) == bmp.getLong(4), s"sum_r of $id")
      assert(png.getLong(5) == bmp.getLong(5), s"sum_g of $id")
      assert(png.getLong(6) == bmp.getLong(6), s"sum_b of $id")
    }
  }

  test("PNG decode rejects corruption with null, never an exception") {
    import graft.functions.PngCodec
    val b = PngCodec.encode(3L)
    assert(PngCodec.decode(b) != null, "baseline sanity")
    // flip a byte inside the second IDAT (payload or CRC): the chunk
    // CRC verification must reject it
    val corrupt = b.clone()
    corrupt(b.length - 20) = (corrupt(b.length - 20) ^ 0x5A).toByte
    assert(PngCodec.decode(corrupt) == null, "CRC-corrupt chunk")
    // truncations at various depths
    assert(PngCodec.decode(b.take(b.length - 13)) == null, "no IEND")
    assert(PngCodec.decode(b.take(20)) == null, "mid-IHDR")
    assert(PngCodec.decode(Array[Byte](1, 2, 3)) == null, "garbage")
    val sig = b.clone(); sig(0) = 0
    assert(PngCodec.decode(sig) == null, "bad signature")
    // unsupported profile: patch IHDR color type to 3 (palette) and
    // re-CRC so ONLY the profile check can reject it
    val pal = b.clone()
    pal(8 + 8 + 9) = 3
    val crc = new java.util.zip.CRC32()
    crc.update(pal, 8 + 4, 4 + 13)
    val cv = crc.getValue.toInt
    (0 until 4).foreach(k =>
      pal(8 + 8 + 13 + k) = ((cv >> (24 - 8 * k)) & 0xFF).toByte)
    assert(PngCodec.decode(pal) == null, "palette profile")
  }

  test("PNG codec runs inside codegen as SQL functions") {
    import graft.functions.BmpCodec
    graft.plans.GraftExtensions.register(spark)
    val out = spark.range(0, 20).toDF("doc_id")
      .selectExpr("graft_png_decode(graft_png_encode(doc_id)) AS img")
      .selectExpr("sum(img.n_pixels) AS np", "count(img.width) AS n")
      .head()
    val want = (0L until 20L)
      .map(id => BmpCodec.width(id).toLong * BmpCodec.height(id)).sum
    assert(out.getLong(0) == want && out.getLong(1) == 20)
  }
}
