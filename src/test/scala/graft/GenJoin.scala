package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Test-data generation re-expressing the reference's methodology
  * (reference: src/test/scala/flink_perf/GenJoinInput.scala:29-136,
  * GenUtil.scala:9-21): generate already-joined nested truths with a
  * deterministic seed, then dissociate them into flat source tables so
  * the expected join output is known by construction.
  *
  * Entities mirror GenJoinInput.scala:32-34 — a 3-level chain
  * A 1—N B 1—N C with FK integrity by construction.
  */
object GenJoin {

  case class A(id: Int, ts: Long)
  case class B(id: Int, ts: Long, ida: Int)
  case class C(id: Int, ts: Long, idb: Int)

  val tMax = 1000000000L
  val dtMaxGen = 1000000L
  val idMax = 1000000

  private val genTs: Gen[Long] = Gen.choose(0L, dtMaxGen).map(tMax - _)
  private val genId: Gen[Int] = Gen.choose(0, idMax)

  /** (Option[A], Seq[B]) with FK b.ida = the drawn A id whether or not
    * A itself is present (leftOptional ⇒ the (None, Some(b)) outer arm,
    * reference GenJoinInput.scala:76-87). */
  def genAB(leftOptional: Boolean, fanoutMax: Int): Gen[(Option[A], Seq[B])] =
    for {
      aid <- genId
      ats <- genTs
      present <- if (leftOptional) Gen.oneOf(true, false) else Gen.const(true)
      n <- Gen.choose(0, fanoutMax)
      bs <- Gen.listOfN(n, for { bid <- genId; bts <- genTs } yield B(bid, bts, aid))
    } yield (if (present) Some(A(aid, ats)) else None, bs)

  /** Non-empty variant: discard units with neither side (reference
    * genABPairNonempty, GenJoinInput.scala:121-123). */
  def genABNonempty(leftOptional: Boolean, fanoutMax: Int): Gen[(Option[A], Seq[B])] =
    genAB(leftOptional, fanoutMax).suchThat { case (oa, bs) =>
      oa.isDefined || bs.nonEmpty
    }

  /** (B, Seq[C]) for the second-level join (reference genBC,
    * GenJoinInput.scala:105-112). */
  def genBC(fanoutMax: Int): Gen[(B, Seq[C])] =
    for {
      bid <- genId
      bts <- genTs
      ida <- genId
      n <- Gen.choose(0, fanoutMax)
      cs <- Gen.listOfN(n, for { cid <- genId; cts <- genTs } yield C(cid, cts, bid))
    } yield (B(bid, bts, ida), cs)

  /** Deterministic exact-N sampling: thread the seed, retry discards
    * (reference GenUtil.sampleExactlyN, GenUtil.scala:9-21). */
  def sampleExactlyN[T](gen: Gen[T], seed: Long, n: Int): List[T] = {
    val params = Gen.Parameters.default
    var s = Seed(seed)
    val out = List.newBuilder[T]
    var count = 0
    var attempts = 0
    while (count < n) {
      require(attempts < n * 1000, "generator discard loop")
      attempts += 1
      gen.apply(params, s) match {
        case Some(t) => out += t; count += 1
        case None    => ()
      }
      s = s.next
    }
    out.result()
  }

  /** Stale-version churn: for each record, derive extra superseded
    * versions (ts − k·delta, same id) the engine must ignore. The
    * reference never generates version churn in batch inputs (its churn
    * comes from stream re-emission); we add it to exercise D1/D2 dedup
    * in every mode. */
  def withStaleVersions[T](xs: Seq[T], copies: Int)(reVersion: (T, Long) => T): Seq[T] =
    xs ++ xs.flatMap(x => (1 to copies).map(k => reVersion(x, k * 17L)))

  /** Latest-wins oracle over any collection (reference
    * OmnicientDeduplicator.scala:4-21): keep max version per dedup key. */
  def omniDedup[T](xs: Seq[T], keyVersion: T => (String, Long)): Seq[T] =
    xs.groupBy(x => keyVersion(x)._1)
      .map { case (_, group) => group.maxBy(x => keyVersion(x)._2) }
      .toSeq
}
