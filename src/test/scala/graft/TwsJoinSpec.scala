package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GenJoin._
import graft.streaming.{Emitted, TwsVersionedJoin, VersionedStreamJoin}

/** The transformWithState twin of the versioned join
  * (TwsVersionedJoin): must satisfy the same convergence contract as
  * the flatMapGroupsWithState implementation, and its typed-timer TTL
  * must retire idle keys without the first-batch anchor hazard.
  * transformWithState requires the RocksDB state store provider, so
  * every test runs inside withStateStoreProvider. */
class TwsJoinSpec extends SparkTestBase {
  import spark.implicits._

  val numSamples = 100

  test("tws full outer converges to the batch answer under chunked replay") {
    VersionedStreamJoin.withStateStoreProvider(spark) {
      val truth = sampleExactlyN(genABNonempty(leftOptional = true,
        fanoutMax = 2), seed = 123L, numSamples)
      val asFresh = truth.flatMap(_._1)
      val bsFresh = truth.flatMap(_._2)
      // stale-version churn: stale copies replayed first
      val as = asFresh.map(a => a.copy(ts = a.ts - 17L)) ++ asFresh
      val bs = bsFresh.map(b => b.copy(ts = b.ts - 17L)) ++ bsFresh

      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val sx = MemoryStream[A]
      val sy = MemoryStream[B]
      val joined = TwsVersionedJoin.fullOuter[A, B](
        sx.toDS(), sy.toDS(),
        _.id.toString, _.ida.toString, _.id.toString, _.id.toString,
        _.ts, _.ts)
      val q = joined.toDF().writeStream.outputMode("update")
        .format("memory").queryName("tws_ab").start()
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
      val raw = spark.table("tws_ab").as[Emitted[A, B]].collect()

      val latestA = as.groupBy(_.id).map { case (k, g) => k -> g.maxBy(_.ts) }
      val bByKey = bs.groupBy(b => (b.ida, b.id)).values.map(_.maxBy(_.ts))
        .toSeq.groupBy(_.ida)
      val keys = latestA.keySet ++ bByKey.keySet
      val expected: Set[(Option[A], Option[B])] = keys.flatMap { k =>
        (latestA.get(k), bByKey.getOrElse(k, Seq.empty)) match {
          case (None, bs2)      => bs2.map(b => (None, Some(b)))
          case (Some(a), Seq()) => Seq((Some(a), None))
          case (Some(a), bs2)   => bs2.map(b => (Some(a), Some(b)))
        }
      }
      assert(raw.length >= expected.size)
      val maxSeq = raw.groupBy(_.key).map { case (k, g) => k -> g.map(_.seq).max }
      val converged = raw.filter(e => e.seq == maxSeq(e.key))
        .map(e => (e.x, e.y)).toSet
      assert(converged == expected)
    }
  }

  test("tws J2/J3/J4/J5 variants converge to the fMGWS twins' answers") {
    VersionedStreamJoin.withStateStoreProvider(spark) {
      val truth = sampleExactlyN(genABNonempty(leftOptional = true,
        fanoutMax = 3), seed = 321L, numSamples)
      val asFresh = truth.flatMap(_._1)
      val bsFresh = truth.flatMap(_._2)
      val as = asFresh.map(a => a.copy(ts = a.ts - 17L)) ++ asFresh
      val bs = bsFresh.map(b => b.copy(ts = b.ts - 17L)) ++ bsFresh

      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

      // shared replay driver: build the joined stream from fresh
      // MemoryStreams, replay chunked, return the converged rows
      def replay[R](name: String)(
          build: (org.apache.spark.sql.Dataset[A],
                  org.apache.spark.sql.Dataset[B]) =>
            org.apache.spark.sql.Dataset[R])(
          implicit enc: org.apache.spark.sql.Encoder[R]): Seq[R] = {
        val sx = MemoryStream[A]
        val sy = MemoryStream[B]
        val q = build(sx.toDS(), sy.toDS()).toDF().writeStream
          .outputMode("update").format("memory").queryName(name).start()
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
        spark.table(name).as[R].collect().toSeq
      }

      // expected building blocks (the same derivation the fMGWS specs
      // use): per-key latest A (J2/J3 quirk), per-(key,id) latest Bs
      val latestA = as.groupBy(_.id).map { case (k, g) => k -> g.maxBy(_.ts) }
      val bByKey = bs.groupBy(b => (b.ida, b.id)).values.map(_.maxBy(_.ts))
        .toSeq.groupBy(_.ida)
      def ysSorted(k: Int): Seq[B] =
        bByKey.getOrElse(k, Seq.empty).sortBy(_.id.toString)

      // J2: at most one x per key; keyless-x keys emit nothing
      val j2raw = replay("tws_j2") { (dx, dy) =>
        TwsVersionedJoin.leftOuter[A, B](dx, dy,
          _.id.toString, _.ida.toString, _.id.toString, _.id.toString,
          _.ts, _.ts).map(e => (e.key, e.seq, e.x, e.y))
      }
      val j2conv = j2raw.groupBy(_._1).values
        .flatMap(g => { val m = g.map(_._2).max; g.filter(_._2 == m) })
        .map(t => (t._3, t._4)).toSet
      // .toSeq first: flatMap on a Map with tuple results rebuilds a
      // MAP keyed by the first element, collapsing a key's multiple Bs
      val j2exp: Set[(Option[A], Option[B])] = latestA.toSeq.flatMap { case (k, a) =>
        ysSorted(k) match {
          case Seq() => Seq((Some(a), None))
          case ys2   => ys2.map(b => (Some(a): Option[A], Some(b): Option[B]))
        }
      }.toSet
      assert(j2conv == j2exp)

      // J3: single latest x + all ys as an id-ordered Seq
      val j3raw = replay("tws_j3") { (dx, dy) =>
        TwsVersionedJoin.leftOuterSeq[A, B](dx, dy,
          _.id.toString, _.ida.toString, _.id.toString, _.id.toString,
          _.ts, _.ts).map(e => (e.key, e.seq, e.xs, e.ys))
      }
      val j3conv = j3raw.groupBy(_._1).values
        .flatMap(g => { val m = g.map(_._2).max; g.filter(_._2 == m) })
        .map(t => (t._3, t._4)).toSet
      val j3exp = latestA.toSeq.map { case (k, a) => (Seq(a), ysSorted(k)) }.toSet
      assert(j3conv == j3exp)

      // J4: both sides as Seqs, either possibly empty (never both)
      val j4raw = replay("tws_j4") { (dx, dy) =>
        TwsVersionedJoin.fullOuterSeq[A, B](dx, dy,
          _.id.toString, _.ida.toString, _.id.toString, _.id.toString,
          _.ts, _.ts).map(e => (e.key, e.seq, e.xs, e.ys))
      }
      val j4conv = j4raw.groupBy(_._1).values
        .flatMap(g => { val m = g.map(_._2).max; g.filter(_._2 == m) })
        .map(t => (t._3, t._4)).toSet
      val j4keys = latestA.keySet ++ bByKey.keySet
      val j4exp = j4keys.map(k =>
        (latestA.get(k).toSeq, ysSorted(k))).toSet
      assert(j4conv == j4exp)

      // J5 (inner, the promoted C5): only both-sides-populated keys
      // emit — the full latest-versions cross product per key
      val j5raw = replay("tws_j5") { (dx, dy) =>
        TwsVersionedJoin.inner[A, B](dx, dy,
          _.id.toString, _.ida.toString, _.id.toString, _.id.toString,
          _.ts, _.ts).map(e => (e.key, e.seq, e.x, e.y))
      }
      val j5conv = j5raw.groupBy(_._1).values
        .flatMap(g => { val m = g.map(_._2).max; g.filter(_._2 == m) })
        .map(t => (t._3, t._4)).toSet
      // the A generator keys by id, so the per-key latest-versions set
      // is the single latestA — inner = latestA × latest Bs, skipping
      // keys missing either side
      val j5exp: Set[(Option[A], Option[B])] = latestA.toSeq.flatMap {
        case (k, a) => bByKey.getOrElse(k, Seq.empty)
          .map(b => (Some(a): Option[A], Some(b): Option[B]))
      }.toSet
      assert(j5conv == j5exp)
    }
  }

  test("tws typed-timer TTL: quiet keys inside the horizon survive; idle keys beyond it retire") {
    VersionedStreamJoin.withStateStoreProvider(spark) {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val base = 1000000000L // epoch-scale event times >> the TTL
      val sx = MemoryStream[A]
      val sy = MemoryStream[B]
      val joined = TwsVersionedJoin.fullOuter[A, B](
        sx.toDS(), sy.toDS(),
        _.id.toString, _.ida.toString, _.id.toString, _.id.toString,
        _.ts, _.ts, ttlMs = Some(500000L))
      val q = joined.toDF().writeStream.outputMode("update")
        .format("memory").queryName("tws_ttl").start()
      def rows() = spark.table("tws_ttl").as[Emitted[A, B]].collect()
      try {
        // chunk 1: two keys; key "1" then goes quiet, key "2" goes idle
        sx.addData(Seq(A(1, base), A(2, base)))
        q.processAllAvailable()
        // many chunks advance the watermark but stay inside base + TTL:
        // neither key may retire (the fMGWS first-batch anchor bug
        // would have retired both here)
        (1 to 12).foreach { i =>
          sx.addData(Seq(A(100 + i, base + i * 1000L)))
          q.processAllAvailable()
        }
        // key "1" gets a partner while alive: must join the original A
        sy.addData(Seq(B(60, base + 11000L, 1)))
        q.processAllAvailable()
        // now push the watermark past base + TTL: key "2" (idle since
        // chunk 1) retires; its timer was re-armed never, anchor=base
        sx.addData(Seq(A(900, base + 600000L)))
        q.processAllAvailable()
        // a late-but-in-watermark partner for key "2" must REBUILD the
        // key from scratch (y-only emission, seq restarted)
        sy.addData(Seq(B(61, base + 595000L, 2)))
        q.processAllAvailable()
      } finally q.stop()
      val k1 = rows().filter(_.key == "1")
      // key 1 never retired: its seq sequence never restarted, and the
      // joined emission carries the chunk-1 A
      assert(k1.map(_.seq).sorted.toSeq == Seq(1L, 2L),
        s"key 1 emissions: ${k1.mkString(", ")}")
      assert(k1.filter(_.seq == 2L).map(e => (e.x, e.y)).toSet ==
        Set((Some(A(1, base)), Some(B(60, base + 11000L, 1)))))
      // key 2 retired and rebuilt: the rebuild emission sees no A side
      val k2 = rows().filter(e => e.key == "2" && e.y.contains(B(61, base + 595000L, 2)))
      assert(k2.nonEmpty && k2.forall(_.x.isEmpty),
        s"key 2 rebuild emissions: ${k2.mkString(", ")}")
    }
  }
}
