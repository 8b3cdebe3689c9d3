package graft

import graft.queries.{DedupOps, Registry}

/** In-JVM brute-force oracle for dedup_substring_spans, independent of
  * the DuckDB twin the driver checks: recompute the per-document
  * duplicated-window statistics with plain Scala collections and
  * require exact agreement on the counts. */
class SubstringDedupSpec extends SparkTestBase {

  private val sfDir = sys.props.getOrElse("graft.testdata.dir",
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001"))

  test("dedup_substring_spans matches an in-memory brute force") {
    val k = DedupOps.substringGramLen
    // split(text, " ") in both engines keeps interior/trailing empty
    // tokens (limit -1) — mirror that here
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toVector)
      .toMap
    val windows: Map[Long, Vector[String]] = docs.collect {
      case (id, t) if t.size >= k =>
        id -> t.sliding(k).map(_.mkString(" ")).toVector
    }
    val docsPerGram: Map[String, Int] = windows.toSeq
      .flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val expected = windows.map { case (id, gs) =>
      id -> ((gs.size.toLong, gs.count(g => docsPerGram(g) >= 2).toLong))
    }

    val got = Registry.all.find(_.name == "dedup_substring_spans").get
      .fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap

    assert(got.keySet == expected.keySet,
      s"document sets differ: ${got.keySet.diff(expected.keySet)} / " +
        s"${expected.keySet.diff(got.keySet)}")
    val bad = expected.collect {
      case (id, (n, dup)) if got(id)._1 != n || got(id)._2 != dup =>
        s"doc $id: expected ($n, $dup) got (${got(id)._1}, ${got(id)._2})"
    }
    assert(bad.isEmpty, s"count mismatches: ${bad.take(5)}")
    val badCov = expected.collect {
      case (id, (n, dup))
        if math.abs(got(id)._3 - dup.toDouble / n) > 1e-6 =>
          s"doc $id coverage ${got(id)._3} vs ${dup.toDouble / n}"
    }
    assert(badCov.isEmpty, s"coverage mismatches: ${badCov.take(5)}")
    // and the statistic is non-degenerate on the corpus: some
    // duplication exists (the testdata carries exact duplicates),
    // but not everything is duplicated
    val dupDocs = got.values.count(_._2 > 0)
    assert(dupDocs > 0 && dupDocs < got.size,
      s"degenerate duplication profile: $dupDocs of ${got.size}")
  }

  test("dedup_substring_trim matches an in-memory brute force") {
    val k = DedupOps.substringGramLen
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toVector)
      .toMap
    // gram → (distinct holder count, lowest holder)
    val holders = docs.toSeq.flatMap { case (id, t) =>
      if (t.size >= k) t.sliding(k).map(_.mkString(" ")).toSeq.distinct
        .map(_ -> id)
      else Nil
    }.groupBy(_._1).view
      .mapValues(hs => (hs.map(_._2).distinct.size, hs.map(_._2).min))
      .toMap
    val expected = docs.map { case (id, t) =>
      val covered = (0 until (t.size - k + 1)).flatMap { i0 =>
        val (nd, mind) = holders(t.slice(i0, i0 + k).mkString(" "))
        if (nd >= 2 && id > mind) i0 until (i0 + k) else Nil
      }.toSet
      val kept = t.zipWithIndex.collect {
        case (tok, i) if !covered(i) => tok
      }
      id -> ((t.size.toLong, kept.size.toLong, kept.mkString(" ")))
    }

    val got = Registry.all.find(_.name == "dedup_substring_trim").get
      .fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap

    assert(got.keySet == expected.keySet, "document sets differ")
    val bad = expected.collect {
      case (id, e) if got(id) != e =>
        s"doc $id: expected (${e._1}, ${e._2}) got (${got(id)._1}, ${got(id)._2})"
    }
    assert(bad.isEmpty, s"trim mismatches: ${bad.take(5)}")
    // the corpus's exact duplicates must come out fully trimmed
    assert(got.values.exists(_._2 == 0L),
      "no document fully trimmed — exact duplicates should be")
  }
}
