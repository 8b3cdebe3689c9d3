package graft

import graft.GenJoin._
import graft.core.TypedVersionedJoins

/** Batch typed joins vs in-memory expectation, on generated
  * dissociated truths with stale-version churn (reference test
  * methodology, JoinSpec.scala:135-155 — strengthened from count
  * equality to full set equality, and with the reference's ignored
  * B⋈C case enabled). */
class TypedJoinsSpec extends SparkTestBase {
  import spark.implicits._

  val numSamples = 100

  // -- AB fixtures ----------------------------------------------------

  private lazy val abTruth: List[(Option[A], Seq[B])] =
    sampleExactlyN(genABNonempty(leftOptional = true, fanoutMax = 2),
      seed = 123L, numSamples)

  // dissociated source tables + stale churn the joins must ignore
  private lazy val as: Seq[A] =
    withStaleVersions(abTruth.flatMap(_._1), copies = 2)(
      (a, d) => a.copy(ts = a.ts - d))
  private lazy val bs: Seq[B] =
    withStaleVersions(abTruth.flatMap(_._2), copies = 2)(
      (b, d) => b.copy(ts = b.ts - d))

  // latest versions (what dedup must recover). Generated ids can
  // collide across units, so B dedups per (key=ida, id) exactly like
  // the engine (D2 semantics), not per global id.
  private lazy val latestA: Map[Int, A] =
    as.groupBy(_.id).map { case (k, g) => k -> g.maxBy(_.ts) }
  private lazy val latestB: Seq[B] =
    bs.groupBy(b => (b.ida, b.id)).values.map(_.maxBy(_.ts)).toSeq
  private lazy val bByKey: Map[Int, Seq[B]] =
    latestB.groupBy(_.ida)

  test("AB full outer join equals by-construction expectation") {
    val got = TypedVersionedJoins.fullOuter[A, B](
      spark.createDataset(as), spark.createDataset(bs),
      _.id.toString, _.ida.toString, _.id.toString, _.id.toString,
      _.ts, _.ts).collect().toSet

    val keys = latestA.keySet ++ bByKey.keySet
    val expected: Set[(Option[A], Option[B])] = keys.flatMap { k =>
      (latestA.get(k), bByKey.getOrElse(k, Seq.empty)) match {
        case (None, bs)      => bs.map(b => (None, Some(b)))
        case (Some(a), Seq()) => Seq((Some(a), None))
        case (Some(a), bs)   => bs.map(b => (Some(a), Some(b)))
      }
    }
    assert(got == expected)
    // sanity on the generator: both outer arms are actually exercised
    assert(expected.exists(_._1.isEmpty))
    assert(expected.exists(_._2.isEmpty))
  }

  test("AB inner join equals by-construction expectation") {
    val got = TypedVersionedJoins.inner[A, B](
      spark.createDataset(as), spark.createDataset(bs),
      _.id.toString, _.ida.toString, _.id.toString, _.id.toString,
      _.ts, _.ts).collect().toSet
    val expected = (latestA.keySet & bByKey.keySet).flatMap { k =>
      bByKey(k).map(b => (latestA(k), b))
    }
    assert(got == expected)
  }

  test("AB left outer join equals by-construction expectation") {
    val got = TypedVersionedJoins.leftOuter[A, B](
      spark.createDataset(as), spark.createDataset(bs),
      _.id.toString, _.ida.toString, _.id.toString, _.id.toString,
      _.ts, _.ts).collect().toSet
    val expected: Set[(A, Option[B])] = latestA.keySet.flatMap { k =>
      val a = latestA(k)
      bByKey.getOrElse(k, Seq.empty) match {
        case Seq() => Seq((a, None))
        case bs    => bs.map(b => (a, Some(b)))
      }
    }
    assert(got == expected)
  }

  test("AB left outer seq join nests all matching Bs") {
    val got = TypedVersionedJoins.leftOuterSeq[A, B](
      spark.createDataset(as), spark.createDataset(bs),
      _.id.toString, _.ida.toString, _.id.toString, _.id.toString,
      _.ts, _.ts).collect()
      .map { case (a, ys) => (a, ys.toSet) }.toSet
    val expected = latestA.keySet.map { k =>
      (latestA(k), bByKey.getOrElse(k, Seq.empty).toSet)
    }
    assert(got == expected)
  }

  test("AB full outer seq join cogroups both sides") {
    val got = TypedVersionedJoins.fullOuterSeq[A, B](
      spark.createDataset(as), spark.createDataset(bs),
      _.id.toString, _.ida.toString, _.id.toString, _.id.toString,
      _.ts, _.ts).collect()
      .map { case (xs, ys) => (xs.toSet, ys.toSet) }.toSet
    val keys = latestA.keySet ++ bByKey.keySet
    val expected = keys.map { k =>
      (latestA.get(k).toSet, bByKey.getOrElse(k, Seq.empty).toSet)
    }
    assert(got == expected)
  }

  // -- the reference's left-outer per-KEY dedup quirk -----------------

  test("left outer keeps one X per key even across distinct ids (reference quirk)") {
    // key = "k" for both xs; ids differ; later ts must win the key
    import TypedJoinsSpec.X
    val xs = Seq(X("k", "x1", 10L), X("k", "x2", 20L))
    val ys = Seq.empty[B]
    val got = TypedVersionedJoins.leftOuter[X, B](
      spark.createDataset(xs), spark.createDataset(ys),
      _.key, _.ida.toString, _.id, _.id.toString, _.ts, _.ts).collect()
    assert(got.toSeq == Seq((X("k", "x2", 20L), None)))
  }

  // -- BC join: the reference's ignored second-level case, enabled ----

  test("BC full outer join equals by-construction expectation (reference's ignored case)") {
    val bcTruth = sampleExactlyN(genBC(fanoutMax = 2), seed = 123L, numSamples)
    val bs2 = withStaleVersions(bcTruth.map(_._1), copies = 1)(
      (b, d) => b.copy(ts = b.ts - d))
    val cs = withStaleVersions(bcTruth.flatMap(_._2), copies = 1)(
      (c, d) => c.copy(ts = c.ts - d))
    val latestB2 = bs2.groupBy(_.id).map { case (k, g) => k -> g.maxBy(_.ts) }
    val latestC = cs.groupBy(c => (c.idb, c.id)).values.map(_.maxBy(_.ts)).toSeq
    val cByKey = latestC.groupBy(_.idb)

    val got = TypedVersionedJoins.fullOuter[B, C](
      spark.createDataset(bs2), spark.createDataset(cs),
      _.id.toString, _.idb.toString, _.id.toString, _.id.toString,
      _.ts, _.ts).collect().toSet

    val keys = latestB2.keySet ++ cByKey.keySet
    val expected: Set[(Option[B], Option[C])] = keys.flatMap { k =>
      (latestB2.get(k), cByKey.getOrElse(k, Seq.empty)) match {
        case (None, cs)       => cs.map(c => (None, Some(c)))
        case (Some(b), Seq()) => Seq((Some(b), None))
        case (Some(b), cs)    => cs.map(c => (Some(b), Some(c)))
      }
    }
    assert(got == expected)
  }
}

object TypedJoinsSpec {
  /** Entity whose key differs from its id — exercises the reference's
    * left-outer per-KEY dedup quirk (cogroupFunctions.scala:31-32). */
  case class X(key: String, id: String, ts: Long)
}
