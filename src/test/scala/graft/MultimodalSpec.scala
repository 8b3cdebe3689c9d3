package graft

import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalPipeline

/** Properties of the multimodal chunkers, centered on the one that
  * motivates content-defined chunking: boundary survival under edits. */
class MultimodalSpec extends SparkTestBase {

  private def chunksOf(texts: Seq[(Long, String)],
                       cdc: Boolean): Map[Long, Seq[String]] = {
    import spark.implicits._
    val df = texts.toDF("doc_id", "text")
    val out =
      if (cdc) MultimodalPipeline.cdcChunkHashes(df, col("text"),
        window = 16, divisor = 32)
      else MultimodalPipeline.chunkHashes(df, col("text"), chunkBytes = 32)
    out.orderBy(col("doc_id"), col("chunk_idx"))
      .select(col("doc_id"), col("chunk_md5"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(1)).toSeq).toMap
  }

  private val base = (0 until 40).map(i => s"sentence number $i padded out.")
    .mkString(" ")

  test("cdc chunks cover the payload exactly (concat of chunks == payload)") {
    import spark.implicits._
    val df = Seq((1L, base)).toDF("doc_id", "text")
    val rebuilt = MultimodalPipeline.cdcChunkHashes(df, col("text"),
        window = 16, divisor = 32)
      .orderBy(col("chunk_idx"))
      .agg(sum(col("chunk_len"))).head().getLong(0)
    assert(rebuilt == base.length, "chunk lengths must sum to payload length")
  }

  test("an insertion re-chunks only its neighborhood under CDC, " +
    "but shifts every downstream chunk under fixed-size chunking") {
    val edited = base.substring(0, 50) + "INSERTED BYTES " + base.substring(50)
    val cdc = chunksOf(Seq((1L, base), (2L, edited)), cdc = true)
    val fixed = chunksOf(Seq((1L, base), (2L, edited)), cdc = false)

    def shared(m: Map[Long, Seq[String]]): Int =
      m(1L).toSet.intersect(m(2L).toSet).size

    // CDC: all chunks strictly after the edit's neighborhood survive —
    // at least half of the original chunk set must still match.
    assert(shared(cdc) * 2 >= cdc(1L).size,
      s"CDC kept only ${shared(cdc)} of ${cdc(1L).size} chunks after a " +
        "front insertion — boundaries failed to re-synchronize")
    // Fixed-size: the 15-byte shift misaligns every downstream block;
    // only content before the edit can still match.
    assert(shared(fixed) <= 2,
      s"fixed-size chunking unexpectedly kept ${shared(fixed)} chunks " +
        "across a non-block-aligned insertion")
    // and CDC must beat fixed-size on this workload — the whole point
    assert(shared(cdc) > shared(fixed))
  }

  // s37's scan stage counts per-doc chunk multiplicities with a
  // sorted-runs single pass; pin it to the naive explode-and-count
  // oracle so the O(n log n) rewrite can never drift from it.
  test("cdc chunk-count rows match the explode-and-count oracle") {
    import spark.implicits._
    // repeat a block so some chunks recur WITHIN one document
    val texts = Seq(1L -> (base + " " + base), 2L -> base,
      3L -> "short", 4L -> "")
    val df = texts.toDF("doc_id", "text")
    val got = graft.queries.StreamDedupTwins.cdcChunkCountRows(df)
      .groupBy(col("doc_id"), col("chunk_md5"))
      .agg(sum(col("cnt")).as("cnt"))
    val want = MultimodalPipeline.cdcChunkHashes(df, col("text"),
        window = 16, divisor = 32)
      .groupBy(col("doc_id"), col("chunk_md5"))
      .agg(count(lit(1)).as("cnt"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "sorted-runs multiplicity counting diverged from explode-and-count")
  }

  test("BMP codec round trip: decode recovers the generator's closed-form stats") {
    import graft.functions.BmpCodec
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 17L, 123L)) {
      val row = BmpCodec.decode(BmpCodec.encode(id))
      assert(row != null)
      val w = BmpCodec.width(id); val h = BmpCodec.height(id)
      assert(row.getInt(0) == w && row.getInt(1) == h && row.getInt(2) == 24)
      assert(row.getLong(3) == w.toLong * h)
      for (c <- 0 until 3) {
        val want = (for (y <- 0 until h; x <- 0 until w)
          yield BmpCodec.pixel(id, x, y, c).toLong).sum
        assert(row.getLong(4 + c) == want, s"channel $c of doc $id")
      }
    }
  }

  test("BMP decode rejects malformed payloads with null, not an exception") {
    import graft.functions.BmpCodec
    val good = BmpCodec.encode(7L)
    assert(BmpCodec.decode(Array[Byte]()) == null, "empty")
    assert(BmpCodec.decode("not a bitmap at all, just text bytes!!!!!!!!!!!!!!!!!"
      .getBytes("UTF-8")) == null, "wrong magic")
    val truncated = good.take(good.length - 1)
    assert(BmpCodec.decode(truncated) == null, "pixel array truncated")
    val badBpp = good.clone(); badBpp(28) = 32
    assert(BmpCodec.decode(badBpp) == null, "unsupported bpp")
    val compressed = good.clone(); compressed(30) = 1
    assert(BmpCodec.decode(compressed) == null, "compressed")
  }

  test("BMP decode handles top-down (negative height) storage") {
    import graft.functions.BmpCodec
    val b = BmpCodec.encode(3L)
    val h = BmpCodec.height(3L)
    // rewrite height as -h (two's-complement little-endian)
    val neg = -h
    b(22) = (neg & 0xFF).toByte; b(23) = ((neg >> 8) & 0xFF).toByte
    b(24) = ((neg >> 16) & 0xFF).toByte; b(25) = ((neg >> 24) & 0xFF).toByte
    val row = BmpCodec.decode(b)
    assert(row != null && row.getInt(1) == h,
      "abs(height) rows decoded for top-down storage")
    // channel sums are row-order independent, so they still match
    val w = BmpCodec.width(3L)
    val wantR = (for (y <- 0 until h; x <- 0 until w)
      yield BmpCodec.pixel(3L, x, y, 0).toLong).sum
    assert(row.getLong(4) == wantR)
  }

  test("BMP codec runs inside codegen as SQL functions") {
    graft.plans.GraftExtensions.register(spark)
    val out = spark.range(0, 20).toDF("doc_id")
      .selectExpr("graft_bmp_decode(graft_bmp_encode(doc_id)) AS img")
      .selectExpr("sum(img.n_pixels) AS np", "count(img.width) AS n")
      .head()
    val want = (0L until 20L)
      .map(id => graft.functions.BmpCodec.width(id).toLong *
        graft.functions.BmpCodec.height(id)).sum
    assert(out.getLong(0) == want && out.getLong(1) == 20)
  }

  test("BMP resize: NN resample picks source pixel (x*w/W, y*h/H), " +
    "output is a decodable spec-complete BMP") {
    import graft.functions.BmpCodec
    for (id <- Seq(0L, 3L, 17L, 123L); (ow, oh) <- Seq((4, 4), (2, 3), (10, 7))) {
      val thumb = BmpCodec.resize(BmpCodec.encode(id), ow, oh)
      assert(thumb != null)
      val row = BmpCodec.decode(thumb)
      assert(row != null && row.getInt(0) == ow && row.getInt(1) == oh,
        s"doc $id -> ${ow}x$oh")
      val w = BmpCodec.width(id); val h = BmpCodec.height(id)
      for (c <- 0 until 3) {
        val want = (for (y <- 0 until oh; x <- 0 until ow)
          yield BmpCodec.pixel(id, x * w / ow, y * h / oh, c).toLong).sum
        assert(row.getLong(4 + c) == want,
          s"channel $c of doc $id at ${ow}x$oh")
      }
    }
  }

  test("BMP resize handles top-down sources and rejects malformed input") {
    import graft.functions.BmpCodec
    val b = BmpCodec.encode(5L)
    val h = BmpCodec.height(5L); val w = BmpCodec.width(5L)
    val neg = -h
    b(22) = (neg & 0xFF).toByte; b(23) = ((neg >> 8) & 0xFF).toByte
    b(24) = ((neg >> 16) & 0xFF).toByte; b(25) = ((neg >> 24) & 0xFF).toByte
    // re-store rows top-down so the image content is unchanged
    val st = BmpCodec.stride(w)
    val flipped = b.clone()
    for (r <- 0 until h)
      System.arraycopy(b, 54 + (h - 1 - r) * st, flipped, 54 + r * st, st)
    val row = BmpCodec.decode(BmpCodec.resize(flipped, 3, 3))
    assert(row != null)
    val wantR = (for (y <- 0 until 3; x <- 0 until 3)
      yield BmpCodec.pixel(5L, x * w / 3, y * h / 3, 0).toLong).sum
    assert(row.getLong(4) == wantR, "top-down source resampled identically")
    assert(BmpCodec.resize(Array[Byte](1, 2, 3), 4, 4) == null, "garbage")
    assert(BmpCodec.resize(BmpCodec.encode(5L), 0, 4) == null, "bad shape")
  }

  test("BMP resize runs inside codegen as a SQL function") {
    graft.plans.GraftExtensions.register(spark)
    val out = spark.range(0, 20).toDF("doc_id")
      .selectExpr(
        "graft_bmp_decode(graft_bmp_resize(graft_bmp_encode(doc_id), 4, 4)) AS img")
      .selectExpr("sum(img.n_pixels) AS np", "count(img.width) AS n")
      .head()
    assert(out.getLong(0) == 20L * 16 && out.getLong(1) == 20)
  }

  test("BMP pool: cell means match the closed-form pattern, both row " +
      "orders; malformed and too-small inputs are null") {
    import graft.functions.BmpCodec
    def wantFeats(id: Long): Seq[Long] = {
      val w = BmpCodec.width(id); val h = BmpCodec.height(id)
      val sums = Array.fill(48)(0L); val counts = Array.fill(16)(0L)
      for (y <- 0 until h; x <- 0 until w) {
        val cell = (y * 4 / h) * 4 + (x * 4 / w)
        counts(cell) += 1
        for (c <- 0 until 3)
          sums(cell * 3 + c) += BmpCodec.pixel(id, x, y, c)
      }
      (0 until 48).map(i => sums(i) * 1000L / counts(i / 3))
    }
    for (id <- 0L until 20L) {
      val arr = BmpCodec.pool(BmpCodec.encode(id), 4, 4)
      assert(arr != null, s"doc $id")
      assert(arr.toLongArray().toSeq == wantFeats(id), s"doc $id features")
    }
    // top-down storage pools to the identical features
    val id = 5L
    val b = BmpCodec.encode(id)
    val h = BmpCodec.height(id); val w = BmpCodec.width(id)
    val st = BmpCodec.stride(w)
    val neg = -h
    val flipped = b.clone()
    flipped(22) = (neg & 0xFF).toByte; flipped(23) = ((neg >> 8) & 0xFF).toByte
    flipped(24) = ((neg >> 16) & 0xFF).toByte
    flipped(25) = ((neg >> 24) & 0xFF).toByte
    for (r <- 0 until h)
      System.arraycopy(b, 54 + (h - 1 - r) * st, flipped, 54 + r * st, st)
    assert(BmpCodec.pool(flipped, 4, 4).toLongArray().toSeq == wantFeats(id))
    assert(BmpCodec.pool(Array[Byte](1, 2, 3), 4, 4) == null, "garbage")
    assert(BmpCodec.pool(BmpCodec.encode(0L), 16, 16) == null,
      "grid larger than the image (min width 4): a cell would be empty")
    assert(BmpCodec.pool(BmpCodec.encode(0L), 0, 4) == null, "bad grid")
  }

  test("BMP pool runs inside codegen as a SQL function") {
    graft.plans.GraftExtensions.register(spark)
    val out = spark.range(0, 20).toDF("doc_id")
      .selectExpr("graft_bmp_pool(graft_bmp_encode(doc_id), 4, 4) AS f")
      .selectExpr("sum(size(f)) AS dims", "count(*) AS n")
      .head()
    assert(out.getLong(0) == 20L * 48 && out.getLong(1) == 20)
  }

  test("WAV codec round trip: chunk-walked decode recovers the closed-form stats") {
    import graft.functions.WavCodec
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 9L, 250L)) {
      val row = WavCodec.decode(WavCodec.encode(id))
      assert(row != null)
      val n = WavCodec.frames(id)
      assert(row.getInt(0) == 2 && row.getInt(1) == 8000 && row.getInt(2) == 16)
      assert(row.getLong(3) == n.toLong)
      val l = (0 until n).map(i => WavCodec.sample(id, i, 0).toLong).sum
      val r = (0 until n).map(i => WavCodec.sample(id, i, 1).toLong).sum
      val pk = (0 until n).flatMap(i => Seq(
        math.abs(WavCodec.sample(id, i, 0)), math.abs(WavCodec.sample(id, i, 1)))).max
      assert(row.getLong(4) == l && row.getLong(5) == r && row.getInt(6) == pk)
    }
  }

  test("WAV decode walks chunks (junk LIST chunk present) and rejects malformed input") {
    import graft.functions.WavCodec
    val good = WavCodec.encode(5L)
    // the generated container really does hold a junk chunk before data
    assert(new String(good, 36, 4, "US-ASCII") == "LIST",
      "generator must emit the junk chunk the walker has to skip")
    assert(WavCodec.decode(Array[Byte]()) == null, "empty")
    assert(WavCodec.decode("RIFFxxxxWAVEbut then garbage that is not chunks"
      .getBytes("US-ASCII")) == null, "broken chunk list")
    val badFmt = good.clone(); badFmt(20) = 3 // audioFormat = IEEE float
    assert(WavCodec.decode(badFmt) == null, "non-PCM rejected")
    val truncated = good.take(good.length - 3)
    assert(WavCodec.decode(truncated) == null, "truncated data chunk")
  }

  test("WAV decode handles mono 16-bit PCM (minimal hand-built container)") {
    // hand-assemble a mono file: RIFF/WAVE + fmt + data with 2 samples
    val samples = Seq(1000, -1000)
    val dataLen = samples.size * 2
    val riffLen = 4 + 24 + 8 + dataLen
    val b = new Array[Byte](8 + riffLen)
    var o = 0
    def ascii(s: String): Unit = s.foreach { ch => b(o) = ch.toByte; o += 1 }
    def le32(v: Int): Unit = { (0 until 4).foreach(k => { b(o) = ((v >> (8 * k)) & 0xFF).toByte; o += 1 }) }
    def le16(v: Int): Unit = { (0 until 2).foreach(k => { b(o) = ((v >> (8 * k)) & 0xFF).toByte; o += 1 }) }
    ascii("RIFF"); le32(riffLen); ascii("WAVE")
    ascii("fmt "); le32(16); le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
    ascii("data"); le32(dataLen); samples.foreach(s => le16(s & 0xFFFF))
    val row = graft.functions.WavCodec.decode(b)
    assert(row != null && row.getInt(0) == 1 && row.getLong(3) == 2L)
    assert(row.getLong(4) == 0L && row.getLong(5) == 0L && row.getInt(6) == 1000)
  }

  test("WAV pool: band means of |PCM| match the closed-form pattern; " +
      "malformed and too-short inputs are null") {
    import graft.functions.WavCodec
    def wantFeats(id: Long, nBands: Int): Seq[Long] = {
      val n = WavCodec.frames(id)
      val sums = Array.fill(nBands * 2)(0L); val counts = Array.fill(nBands)(0L)
      for (i <- 0 until n) {
        val band = (i.toLong * nBands / n).toInt
        counts(band) += 1
        for (c <- 0 until 2)
          sums(band * 2 + c) += math.abs(WavCodec.sample(id, i, c))
      }
      (0 until nBands * 2).map(k => sums(k) * 1000L / counts(k / 2))
    }
    for (id <- 0L until 20L) {
      val arr = WavCodec.pool(WavCodec.encode(id), 16)
      assert(arr != null, s"doc $id")
      assert(arr.toLongArray().toSeq == wantFeats(id, 16), s"doc $id features")
    }
    // a band count that does NOT divide the frame count still
    // partitions every frame exactly once (grid rule, not stride)
    val arr7 = WavCodec.pool(WavCodec.encode(3L), 7)
    assert(arr7 != null && arr7.numElements() == 14)
    assert(arr7.toLongArray().toSeq == wantFeats(3L, 7))
    assert(WavCodec.pool(Array[Byte](1, 2, 3), 16) == null, "garbage")
    assert(WavCodec.pool(WavCodec.encode(0L), 0) == null, "bad band count")
    assert(WavCodec.pool(WavCodec.encode(0L), 1000) == null,
      "more bands than frames: a band would be empty")
    val badFmt = WavCodec.encode(5L).clone(); badFmt(20) = 3
    assert(WavCodec.pool(badFmt, 16) == null, "non-PCM rejected")
  }

  test("WAV pool runs inside codegen as a SQL function") {
    graft.plans.GraftExtensions.register(spark)
    val out = spark.range(0, 20).toDF("doc_id")
      .selectExpr("graft_wav_pool(graft_wav_encode(doc_id), 16) AS f")
      .selectExpr("sum(size(f)) AS dims", "count(*) AS n")
      .head()
    assert(out.getLong(0) == 20L * 32 && out.getLong(1) == 20)
  }

  test("WAV resample: 2x decimation keeps every second frame at half rate, " +
    "output is a decodable spec-complete container") {
    import graft.functions.WavCodec
    for (id <- Seq(0L, 3L, 17L, 123L); f <- Seq(2, 3)) {
      val half = WavCodec.resample(WavCodec.encode(id), f)
      assert(half != null)
      val row = WavCodec.decode(half)
      val n = WavCodec.frames(id)
      val kept = (n + f - 1) / f
      assert(row != null && row.getInt(0) == 2 &&
        row.getInt(1) == WavCodec.SampleRate / f &&
        row.getLong(3) == kept.toLong, s"doc $id factor $f")
      // junk chunk dropped: minimal 44-byte header + data
      assert(half.length == 44 + kept * 4, "normalized container size")
      for (c <- 0 until 2) {
        val want = (0 until kept).map(j =>
          WavCodec.sample(id, j * f, c).toLong).sum
        assert(row.getLong(4 + c) == want, s"channel $c of doc $id /$f")
      }
      val wantPeak = (0 until kept).flatMap(j => Seq(
        math.abs(WavCodec.sample(id, j * f, 0)),
        math.abs(WavCodec.sample(id, j * f, 1)))).max
      assert(row.getInt(6) == wantPeak)
    }
  }

  test("WAV resample handles odd frame counts (mono) and rejects malformed input") {
    import graft.functions.WavCodec
    // hand-assemble a mono file with 3 samples; factor 2 keeps 0 and 2
    val samples = Seq(100, -700, 300)
    val dataLen = samples.size * 2
    val riffLen = 4 + 24 + 8 + dataLen
    val b = new Array[Byte](8 + riffLen)
    var o = 0
    def ascii(s: String): Unit = s.foreach { ch => b(o) = ch.toByte; o += 1 }
    def le32(v: Int): Unit = { (0 until 4).foreach(k => { b(o) = ((v >> (8 * k)) & 0xFF).toByte; o += 1 }) }
    def le16(v: Int): Unit = { (0 until 2).foreach(k => { b(o) = ((v >> (8 * k)) & 0xFF).toByte; o += 1 }) }
    ascii("RIFF"); le32(riffLen); ascii("WAVE")
    ascii("fmt "); le32(16); le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
    ascii("data"); le32(dataLen); samples.foreach(s => le16(s & 0xFFFF))
    val row = WavCodec.decode(WavCodec.resample(b, 2))
    assert(row != null && row.getInt(0) == 1 && row.getLong(3) == 2L)
    assert(row.getLong(4) == 400L && row.getInt(6) == 300)
    assert(WavCodec.resample(Array[Byte](1, 2, 3), 2) == null, "garbage")
    assert(WavCodec.resample(WavCodec.encode(1L), 0) == null, "bad factor")
  }

  test("WAV resample runs inside codegen as a SQL function") {
    graft.plans.GraftExtensions.register(spark)
    val out = spark.range(0, 20).toDF("doc_id")
      .selectExpr(
        "graft_wav_decode(graft_wav_resample(graft_wav_encode(doc_id), 2)) AS a")
      .selectExpr("sum(a.n_frames) AS nf", "count(a.sample_rate) AS n",
        "min(a.sample_rate) AS sr")
      .head()
    val want = (0L until 20L)
      .map(id => (graft.functions.WavCodec.frames(id) + 1) / 2).sum
    assert(out.getLong(0) == want && out.getLong(1) == 20 &&
      out.getInt(2) == 4000)
  }

  test("WAV codec runs inside codegen as SQL functions") {
    graft.plans.GraftExtensions.register(spark)
    val out = spark.range(0, 20).toDF("doc_id")
      .selectExpr("graft_wav_decode(graft_wav_encode(doc_id)) AS au")
      .selectExpr("sum(au.n_frames) AS nf", "count(au.channels) AS n")
      .head()
    val want = (0L until 20L).map(id => graft.functions.WavCodec.frames(id).toLong).sum
    assert(out.getLong(0) == want && out.getLong(1) == 20)
  }

  test("codec hardening: crafted headers return null and negative ids " +
      "encode well-formed containers (never throw)") {
    import graft.functions.{BmpCodec, WavCodec}
    def patch32(b: Array[Byte], off: Int, v: Int): Array[Byte] = {
      val c = b.clone()
      (0 until 4).foreach(k => c(off + k) = ((v >> (8 * k)) & 0xFF).toByte)
      c
    }
    // BMP width whose stride overflows Int: the negative stride would
    // pass the Long bounds check and crash the pixel loop — must be
    // rejected up front as null
    val wide = patch32(BmpCodec.encode(0L), 18, 800000000)
    assert(BmpCodec.decode(wide) == null, "overflow width decode")
    assert(BmpCodec.resize(wide, 4, 4) == null, "overflow width resize")
    // height Int.MinValue: abs() stays negative — must reject
    val deep = patch32(BmpCodec.encode(0L), 22, Int.MinValue)
    assert(BmpCodec.decode(deep) == null, "MinValue height")
    // WAV with a TRUNCATED fmt chunk as the last chunk in the file:
    // the 16 declared fmt fields would read past the buffer
    val dataLen = 0
    val riffLen = 4 + (8 + dataLen) + (8 + 4) // data first, short fmt last
    val t = new Array[Byte](8 + riffLen)
    var o = 0
    def ascii(s: String): Unit = s.foreach { ch => t(o) = ch.toByte; o += 1 }
    def le32(v: Int): Unit = { (0 until 4).foreach(k => { t(o) = ((v >> (8 * k)) & 0xFF).toByte; o += 1 }) }
    ascii("RIFF"); le32(riffLen); ascii("WAVE")
    ascii("data"); le32(dataLen)
    ascii("fmt "); le32(4); le32(1) // only 4 of the 16 fmt bytes exist
    assert(WavCodec.decode(t) == null, "truncated fmt chunk decode")
    assert(WavCodec.resample(t, 2) == null, "truncated fmt chunk resample")
    // negative ids: encoders must emit well-formed containers that
    // round-trip (floorMod-derived dimensions), not throw
    val bmp = BmpCodec.decode(BmpCodec.encode(-7L))
    assert(bmp != null && bmp.getInt(0) == BmpCodec.width(-7L))
    val wav = WavCodec.decode(WavCodec.encode(-7L))
    assert(wav != null && wav.getLong(3) == WavCodec.frames(-7L).toLong)
  }
}
