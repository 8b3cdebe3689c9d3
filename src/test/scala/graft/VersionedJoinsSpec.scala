package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.core.{SkewTools, VersionedJoins, VersionedTable}

/** Unit coverage for the untyped DataFrame API (the oracle gate
  * exercises it end-to-end; these pin the per-operator contracts on
  * hand-built minimal cases). */
class VersionedJoinsSpec extends SparkTestBase {
  import spark.implicits._

  // x side: key k1 has two versions of id a (ts 1 < 2) and one id b;
  // key k2 exists only on x. y side: k1 matched, k3 unmatched.
  private lazy val xdf = Seq(
    ("k1", "a", 1L, "stale"), ("k1", "a", 2L, "fresh"),
    ("k1", "b", 1L, "b1"), ("k2", "c", 5L, "c1")
  ).toDF("k", "id", "ts", "payload")
  private lazy val ydf = Seq(
    ("k1", "p", 7L, "p-stale"), ("k1", "p", 9L, "p-fresh"),
    ("k3", "q", 3L, "q1")
  ).toDF("yk", "yid", "yts", "ypayload")

  private def xt = VersionedTable(xdf, Seq(col("k")), Seq(col("id")),
    col("ts"), col("payload"))
  private def yt = VersionedTable(ydf, Seq(col("yk")), Seq(col("yid")),
    col("yts"), col("ypayload"))

  test("fullOuter: latest versions, cross product, both unmatched arms") {
    val got = VersionedJoins.fullOuter(xt, yt, Seq("k"), Seq("yk"))
      .select(col("k"), col("id"), col("payload"), col("yk"), col("ypayload"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4))).toSet
    assert(got == Set(
      ("k1", "a", "fresh", "k1", "p-fresh"),
      ("k1", "b", "b1", "k1", "p-fresh"),
      ("k2", "c", "c1", null, null),
      (null, null, null, "k3", "q1")))
  }

  test("leftOuter: one x per key (quirk), unmatched keeps null y, no y-only keys") {
    val got = VersionedJoins.leftOuter(xt, yt, Seq("k"), Seq("yk"))
      .select(col("k"), col("id"), col("ypayload"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // k1 keeps ONLY the latest record across ids (id a, ts 2)
    assert(got == Set(("k1", "a", "p-fresh"), ("k2", "c", null)))
  }

  test("leftOuterSeq: collected ids with empty array for unmatched") {
    val got = VersionedJoins.leftOuterSeq(xt, yt, Seq("k"), Seq("yk"),
        sort_array(collect_list(col("yid"))), "yids")
      .select(col("k"), col("yids"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1))).toMap
    assert(got("k1") == Seq("p"))
    assert(got("k2") == Seq.empty)
  }

  test("inner: only fully matched keys survive") {
    val got = VersionedJoins.inner(xt, yt, Seq("k"), Seq("yk"))
      .select(col("k"), col("id")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("k1", "a"), ("k1", "b")))
  }

  test("saltedEquiJoin equals the plain join for every join type") {
    val l = Seq((1, "x1"), (1, "x2"), (2, "x3")).toDF("k", "v")
    val r = Seq((1, "y1"), (3, "y3")).toDF("rk", "rv")
    val plain = l.join(r, col("k") === col("rk"), "inner")
      .select("k", "v", "rv").collect().toSet
    val salted = SkewTools.saltedEquiJoin(l, r, Seq("k"), Seq("rk"),
        spread = col("v"), factor = 4)
      .select("k", "v", "rv").collect().toSet
    assert(salted == plain)
  }
}
