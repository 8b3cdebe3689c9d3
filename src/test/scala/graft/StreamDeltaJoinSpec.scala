package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GenJoin._
import graft.streaming.{Emitted, VersionedStreamJoin}

/** fullOuterDelta (r20): the delta-emitting variant of the versioned
  * full-outer join must (a) converge to the same answer as fullOuter
  * under the per-row-identity fold its consumers (the s11/s22 chain
  * rows) use, and (b) actually emit FEWER raw rows than the full
  * re-emission — the property the optimization exists for. The replay
  * uses the same chunked stale-version churn as StreamJoinSpec, so the
  * delta rules are exercised on every transition: x-before-y,
  * y-before-x ((None, y) rows superseded per identity), x-only keys
  * ((x, None) rows suppressed once a pair exists), version updates on
  * either side (a changed x re-pairs with every y), and multi-y keys
  * (fanout 2). */
class StreamDeltaJoinSpec extends SparkTestBase {
  import spark.implicits._

  val numSamples = 100

  test("fullOuterDelta under the per-identity fold equals fullOuter's " +
      "converged view, with strictly fewer raw emissions") {
    val truth = sampleExactlyN(genABNonempty(leftOptional = true, fanoutMax = 2),
      seed = 321L, numSamples)
    val asFresh = truth.flatMap(_._1)
    val bsFresh = truth.flatMap(_._2)
    // stale versions first: later chunks deliver fresh versions that
    // must supersede (the "changed entry" path of the delta rule)
    val as = asFresh.map(a => a.copy(ts = a.ts - 17L)) ++ asFresh
    val bs = bsFresh.map(b => b.copy(ts = b.ts - 17L)) ++ bsFresh

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def replay(delta: Boolean): Seq[Emitted[A, B]] = {
      val sx = MemoryStream[A]
      val sy = MemoryStream[B]
      val build =
        if (delta) VersionedStreamJoin.fullOuterDelta[A, B] _
        else VersionedStreamJoin.fullOuter[A, B] _
      val joined = build(sx.toDS(), sy.toDS(),
        _.id.toString, _.ida.toString, _.id.toString, _.id.toString,
        _.ts, _.ts)
      val name = if (delta) "delta_ab" else "full_ab"
      val q = joined.toDF().writeStream.outputMode("update")
        .format("memory").queryName(name).start()
      try {
        val chunks = 8
        val sa = math.max(1, (as.length + chunks - 1) / chunks)
        val sb = math.max(1, (bs.length + chunks - 1) / chunks)
        as.grouped(sa).zipAll(bs.grouped(sb), Nil, Nil).foreach {
          case (ca, cb) =>
            if (ca.nonEmpty) sx.addData(ca)
            if (cb.nonEmpty) sy.addData(cb)
            q.processAllAvailable()
        }
      } finally q.stop()
      spark.table(name).as[Emitted[A, B]].collect().toSeq
    }

    val rawFull = replay(delta = false)
    val rawDelta = replay(delta = true)

    // the whole point: the delta stream is strictly smaller (the churn
    // guarantees at least one key is touched across >1 batch, which is
    // exactly where full re-emission pays twice)
    assert(rawDelta.size < rawFull.size,
      s"delta emitted ${rawDelta.size} rows vs full ${rawFull.size}")

    // fullOuter's converged view: whole-key max-seq filter
    val maxSeq = rawFull.groupBy(_.key).map { case (k, g) =>
      k -> g.map(_.seq).max }
    val convergedFull = rawFull.filter(e => e.seq == maxSeq(e.key))
      .map(e => (e.x, e.y)).toSet

    // the delta consumers' fold (one x per key, the s11/s22 shape):
    // y-carrying rows converge per (key, y-id) by latest seq — an x
    // update re-pairs every y at a higher seq, so the latest row per
    // identity carries the current x, and a (None, y) row is
    // superseded by its (x, y) successor under the SAME identity;
    // (x, None) rows are valid only for keys that never emitted a pair
    val yRows = rawDelta.filter(_.y.isDefined)
      .groupBy(e => (e.key, e.y.get.id)).values
      .map(_.maxBy(_.seq)).toSeq
    val keysWithY = yRows.map(_.key).toSet
    val loneX = rawDelta.filter(e => e.y.isEmpty && !keysWithY(e.key))
      .groupBy(_.key).values.map(_.maxBy(_.seq)).toSeq
    val convergedDelta = (yRows ++ loneX).map(e => (e.x, e.y)).toSet

    assert(convergedDelta == convergedFull)

    // and both equal the batch latest-wins answer
    val latestA = as.groupBy(_.id).map { case (k, g) => k -> g.maxBy(_.ts) }
    val latestB = bs.groupBy(b => (b.ida, b.id)).values.map(_.maxBy(_.ts)).toSeq
    val bByKey = latestB.groupBy(_.ida)
    val keys = latestA.keySet ++ bByKey.keySet
    val expected: Set[(Option[A], Option[B])] = keys.flatMap { k =>
      (latestA.get(k), bByKey.getOrElse(k, Seq.empty)) match {
        case (None, bs2)      => bs2.map(b => (None, Some(b)))
        case (Some(a), Seq()) => Seq((Some(a), None))
        case (Some(a), bs2)   => bs2.map(b => (Some(a), Some(b)))
      }
    }
    assert(convergedDelta == expected)
  }
}
