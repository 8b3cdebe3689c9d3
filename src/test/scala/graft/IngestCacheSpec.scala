package graft

import java.nio.file.{Files, Paths}

import graft.queries.StreamingHarness

/** The shared-ingest chunk cache must be invalidated when the driver
  * regenerates a source table IN PLACE (same path, new data): the key
  * carries a (size, newest-mtime) fingerprint of the source parquet, so
  * a regeneration re-publishes instead of silently replaying stale
  * chunks into the streaming rows while the DuckDB oracle reads fresh
  * data (the r08 events regeneration made this failure mode real). */
class IngestCacheSpec extends SparkTestBase {

  test("shared-ingest cache re-publishes when the source table is regenerated") {
    val sf = Files.createTempDirectory("graft_cache_sf_")
    val src = sf.resolve("t.parquet")
    Files.write(src, "v1".getBytes)
    var writes = 0
    def publish() =
      StreamingHarness.sharedChunkDir(sf.toString, "cachespec_t", "t") { p =>
        writes += 1
        Files.createDirectories(p)
        Files.createFile(p.resolve("_SUCCESS"))
      }

    val d1 = publish()
    assert(writes == 1, "first call must publish")
    val d2 = publish()
    assert(writes == 1 && d2 == d1, "unchanged source must cache-hit")

    // in-place regeneration with different content length → new size
    Files.write(src, "v2-regenerated".getBytes)
    val d3 = publish()
    assert(writes == 2 && d3 != d1,
      "size change must produce a fresh publication dir")

    // same-size rewrite → only mtime moves; still must invalidate
    Files.write(src, "v3-regenerated".getBytes)
    Files.setLastModifiedTime(src, java.nio.file.attribute.FileTime
      .fromMillis(Files.getLastModifiedTime(src).toMillis + 10000))
    val d4 = publish()
    assert(writes == 3 && d4 != d3,
      "mtime-only change must produce a fresh publication dir")
  }

  test("srcFingerprint covers directory-shaped tables") {
    val sf = Files.createTempDirectory("graft_cache_dsf_")
    val tdir = sf.resolve("t.parquet")
    Files.createDirectories(tdir)
    Files.write(tdir.resolve("part-0"), "aaaa".getBytes)
    val fp1 = StreamingHarness.srcFingerprint(sf.toString, "t")
    Files.write(tdir.resolve("part-1"), "bbbb".getBytes)
    val fp2 = StreamingHarness.srcFingerprint(sf.toString, "t")
    assert(fp1 != fp2, "adding a file under the table dir must change the fingerprint")
    assert(StreamingHarness.srcFingerprint(sf.toString, "missing") == "absent")
  }
}
