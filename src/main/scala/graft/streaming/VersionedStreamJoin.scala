package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.VersionedDedup

/** One emitted join row, stamped with the per-key emission sequence so
  * downstream consumers can (a) apply the reference's latest-wins dedup
  * contract, or (b) filter to the converged result (max seq per key). */
final case class Emitted[X, Y](key: String, seq: Long,
                               x: Option[X], y: Option[Y])

/** One emitted nested join row (J3/J4 shapes): both sides' latest
  * versions as sequences, ordered by primary id for determinism. */
final case class EmittedSeq[X, Y](key: String, seq: Long,
                                  xs: Seq[X], ys: Seq[Y])

/** Internal tagged-union envelope — the Spark-explicit form of the
  * reference's internal `TaggedUnion[X,Y]` cogroup input (reference:
  * versionDeduplicator.scala:61, VersioningEvictor.scala:15).
  * `ets` carries the record's version as an event-time instant
  * (version interpreted as epoch millis) so event-time TTL mode can
  * hang a watermark on the union. */
final case class Tagged[X, Y](key: String, x: Option[X], y: Option[Y],
                              ets: java.sql.Timestamp)

/** Per-key join state: latest version per id on each side. Upsert on
  * write means the state IS the reference's compacted window buffer —
  * the VersioningEvictor/deduplicateMutable machinery (E1/D3,
  * VersioningEvictor.scala:10-29) becomes unnecessary by construction,
  * and D3's Y-side eviction bug (versionDeduplicator.scala:100) has
  * nothing to port. */
final case class JoinState[X, Y](xs: Map[String, X], ys: Map[String, Y],
                                 seq: Long)

/** Streaming versioned joins over CDC-style upsert streams — the
  * reference's continuously-updated J1–J4 (joins.scala:10-70)
  * re-expressed on Structured Streaming.
  *
  * Shape: map both streams into [[Tagged]], union, `groupByKey(key)`,
  * `flatMapGroupsWithState` (update mode). On every microbatch each
  * touched key upserts arrivals into latest-wins per-id state and
  * re-emits its full join result — per-microbatch granularity instead
  * of the reference's per-record `CountTrigger.of(1)`
  * (joins.scala:19); the reference's own dedup-based verification
  * contract (raw ≥ expected, deduped == expected, JoinSpec.scala:153-154)
  * is insensitive to that difference (SURVEY.md §4.2).
  *
  * At scale: state is hash-partitioned by join key across executors
  * (the Exchange under groupByKey); each key holds only latest
  * versions, so state size is bounded by live entities, not stream
  * length. Skewed keys are the caller's concern (salt the key or
  * pre-aggregate) as with any keyed stateful op.
  */
object VersionedStreamJoin {

  /** Key-retirement clock for [[withTtl]] / [[withEventTimeTtl]]. */
  sealed trait TtlMode
  /** Wall-clock idle time (GroupStateTimeout.ProcessingTimeTimeout). */
  case object ProcessingTimeTtl extends TtlMode
  /** Watermark-aligned: a key idle while the event-time watermark
    * advances `ttl` past its last update is retired — the Spark analog
    * of Flink watermark-driven state cleanup (reference watermark
    * assignment: GenJoinInput.scala:36-52). Versions are interpreted
    * as epoch-millisecond event times; `watermarkDelay` is the bounded
    * out-of-orderness (the reference uses 10,000 ms). */
  final case class EventTimeTtl(watermarkDelay: String) extends TtlMode

  private final case class TtlConf(ms: Long, mode: TtlMode)

  /** Optional key-retirement TTL. The reference never expires state
    * (`GlobalWindows`, SURVEY.md §2.9 late-data note), so the default
    * preserves that: no TTL = keep state forever. At 100 TB a generous
    * TTL bounds state to recently-active entities; a late-but-newer
    * version for a retired key simply rebuilds the key from scratch
    * (upsert semantics make that safe — it can only miss join partners
    * that were themselves retired). Scoped thread-locally so
    * concurrent queries are unaffected. */
  private val ttlConf = new ThreadLocal[Option[TtlConf]] {
    override def initialValue(): Option[TtlConf] = None
  }

  /** Run `body` with all VersionedStreamJoin builders inside it
    * configured to retire idle keys after `ms` of processing time.
    *
    * Caveats for processing-time TTL: (1) the engine runs continuous
    * (empty) microbatches to fire timeouts, so `processAllAvailable()`
    * never observes quiescence — poll the sink or use explicit
    * triggers; (2) a retired key's emission `seq` restarts at 1, so
    * converged-result consumers must treat it as a fresh key. */
  def withTtl[T](ms: Long)(body: => T): T = {
    require(ms > 0, s"TTL must be positive, got $ms")
    ttlConf.set(Some(TtlConf(ms, ProcessingTimeTtl)))
    try body finally ttlConf.set(None)
  }

  /** Run `body` with builders configured for watermark-aligned
    * retirement: a key is dropped once the event-time watermark (built
    * from record versions as epoch millis, minus `watermarkDelay`)
    * passes `ms` beyond the batch that last updated it. Unlike
    * processing-time TTL this fires only when data advances the
    * watermark — no background batches, so `processAllAvailable()`
    * works and tests need no sleeps.
    *
    * SEMANTIC CAVEAT this mode alone carries: because the union is
    * watermarked, `flatMapGroupsWithState` silently DROPS any input
    * row whose version (as event time) is older than
    * watermark − `watermarkDelay` — such a too-late record neither
    * updates nor rebuilds state, unlike the no-TTL and processing-time
    * modes where a late-but-newer version always supersedes and a
    * late-but-older one is ignored by dedup (SURVEY.md §2.9). Size
    * `watermarkDelay` to the stream's real out-of-orderness bound; the
    * default matches the reference's 10,000 ms
    * (JoinSpec.scala:19,140-141). A record later than that bound for a
    * retired key is lost; within the bound, it rebuilds the key from
    * scratch. */
  def withEventTimeTtl[T](ms: Long, watermarkDelay: String = "10 seconds")(
      body: => T): T = {
    require(ms > 0, s"TTL must be positive, got $ms")
    ttlConf.set(Some(TtlConf(ms, EventTimeTtl(watermarkDelay))))
    try body finally ttlConf.set(None)
  }

  /** FQCN of Spark's RocksDB state store provider — the off-heap,
    * disk-spilling backend the streaming joins should run on once live
    * key cardinality outgrows the default in-memory HDFS-backed
    * provider (at 100 TB state it is the only option that holds). */
  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `body` with the session's streaming state store backed by
    * `providerClass` (e.g. [[RocksDbProvider]]), restoring the prior
    * settings after. The provider is read per streaming query at
    * start, so this scopes cleanly around query construction +
    * execution. For RocksDB, changelog checkpointing is enabled too:
    * each microbatch then uploads only the batch's state DELTA to the
    * checkpoint (snapshots move to background maintenance), instead of
    * snapshotting the full store inline — at 100 TB state the per-batch
    * checkpoint cost must track the update rate, not the store size. */
  def withStateStoreProvider[T](spark: org.apache.spark.sql.SparkSession,
                                providerClass: String = RocksDbProvider)(
      body: => T): T = {
    val changelogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val keys = Seq("spark.sql.streaming.stateStore.providerClass" ->
        providerClass) ++
      (if (providerClass == RocksDbProvider) Seq(changelogKey -> "true")
       else Nil)
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** J1: full-outer — emits (None,Some)/(Some,None) for unmatched
    * sides, else the per-key cross product of latest versions
    * (reference cgfFullOuter, cogroupFunctions.scala:7-30). */
  def fullOuter[X, Y](
      dsx: Dataset[X], dsy: Dataset[Y],
      keyFromX: X => String, keyFromY: Y => String,
      idFromX: X => String, idFromY: Y => String,
      tsFromX: X => Long, tsFromY: Y => Long)(
      implicit ex: Encoder[X], ey: Encoder[Y],
      et: Encoder[Tagged[X, Y]], es: Encoder[String],
      ej: Encoder[JoinState[X, Y]],
      ee: Encoder[Emitted[X, Y]]): Dataset[Emitted[X, Y]] =
    joined(dsx, dsy, keyFromX, keyFromY, idFromX, idFromY, tsFromX, tsFromY) {
      (key, seq, _, _, xs, ys) =>
        if (xs.isEmpty) ys.valuesIterator.map(y => Emitted(key, seq, None, Some(y)))
        else if (ys.isEmpty) xs.valuesIterator.map(x => Emitted(key, seq, Some(x), None))
        else for (x <- xs.valuesIterator; y <- ys.values)
          yield Emitted(key, seq, Some(x), Some(y))
    }

  /** [[fullOuter]] with DELTA emission: per trigger a touched key emits
    * only the join rows whose content CHANGED this batch — the pairs
    * involving a newly-arrived or newly-superseded version on either
    * side — instead of re-emitting its full current result. State,
    * upsert semantics, seq stamping and TTL behavior are byte-identical
    * to [[fullOuter]]; only the emission set shrinks. The changed set
    * is exact for the full-outer shape:
    *   - both sides populated: (changed x) × (all y) ∪ (unchanged x) ×
    *     (changed y) — covers the None→Some side transitions too, since
    *     a previously-empty side makes every entry of it "changed" and
    *     therefore re-pairs the whole key;
    *   - one side empty: the changed entries of the populated side as
    *     (x, None) / (None, y) rows.
    * A downstream fold must therefore converge per ROW IDENTITY —
    * latest seq per (key, x-id, y-id), with (x, None) rows valid only
    * while the key has never emitted a pair — instead of [[fullOuter]]'s
    * whole-key max-seq filter, because the last emission for a key no
    * longer carries its full result. ((None, y) rows need no such
    * guard: the pair that supersedes one always carries a higher seq
    * for the same y id, so per-identity latest-wins already retires
    * it.) Used by the chain rows (s11/s22), where every stage-1
    * re-emission is a stage-2 state upsert: pruning the relay volume
    * cuts the downstream per-row state work at its source — the
    * guide's "shuffle fewer bytes" applied to a stream relay. At
    * 100 TB the full re-emission is quadratic in a hot key's update
    * count; the delta is linear. */
  def fullOuterDelta[X, Y](
      dsx: Dataset[X], dsy: Dataset[Y],
      keyFromX: X => String, keyFromY: Y => String,
      idFromX: X => String, idFromY: Y => String,
      tsFromX: X => Long, tsFromY: Y => Long)(
      implicit ex: Encoder[X], ey: Encoder[Y],
      et: Encoder[Tagged[X, Y]], es: Encoder[String],
      ej: Encoder[JoinState[X, Y]],
      ee: Encoder[Emitted[X, Y]]): Dataset[Emitted[X, Y]] =
    joined(dsx, dsy, keyFromX, keyFromY, idFromX, idFromY, tsFromX, tsFromY) {
      (key, seq, xs0, ys0, xs, ys) =>
        // an entry changed iff absent before the batch or replaced by a
        // strictly newer version (upsert is strict >, so an equal
        // version is the same entry)
        def xChanged(id: String): Boolean =
          !xs0.contains(id) || tsFromX(xs0(id)) != tsFromX(xs(id))
        def yChanged(id: String): Boolean =
          !ys0.contains(id) || tsFromY(ys0(id)) != tsFromY(ys(id))
        if (xs.isEmpty)
          ys.iterator.collect { case (id, y) if yChanged(id) =>
            Emitted[X, Y](key, seq, None, Some(y)) }
        else if (ys.isEmpty)
          xs.iterator.collect { case (id, x) if xChanged(id) =>
            Emitted[X, Y](key, seq, Some(x), None) }
        else {
          val (newX, oldX) = xs.partition { case (id, _) => xChanged(id) }
          val newYs = ys.iterator
            .collect { case (id, y) if yChanged(id) => y }.toList
          (for (x <- newX.valuesIterator; y <- ys.values)
            yield Emitted(key, seq, Some(x), Some(y))) ++
          (for (x <- oldX.valuesIterator; y <- newYs.iterator)
            yield Emitted(key, seq, Some(x), Some(y)))
        }
    }

  /** J2: left-outer — at most one x per key (latest by ts over the
    * whole key, the reference quirk, cogroupFunctions.scala:31-47);
    * keys with no x emit nothing. */
  def leftOuter[X, Y](
      dsx: Dataset[X], dsy: Dataset[Y],
      keyFromX: X => String, keyFromY: Y => String,
      idFromX: X => String, idFromY: Y => String,
      tsFromX: X => Long, tsFromY: Y => Long)(
      implicit ex: Encoder[X], ey: Encoder[Y],
      et: Encoder[Tagged[X, Y]], es: Encoder[String],
      ej: Encoder[JoinState[X, Y]],
      ee: Encoder[Emitted[X, Y]]): Dataset[Emitted[X, Y]] =
    joined(dsx, dsy, keyFromX, keyFromY, idFromX, idFromY, tsFromX, tsFromY) {
      (key, seq, _, _, xs, ys) =>
        VersionedDedup.latestOne(xs.valuesIterator, tsFromX) match {
          case None => Iterator.empty
          case Some(x) =>
            if (ys.isEmpty) Iterator.single(Emitted(key, seq, Some(x), None))
            else ys.valuesIterator.map(y => Emitted(key, seq, Some(x), Some(y)))
        }
    }

  /** J5 analog: inner — emits only when both sides are populated. */
  def inner[X, Y](
      dsx: Dataset[X], dsy: Dataset[Y],
      keyFromX: X => String, keyFromY: Y => String,
      idFromX: X => String, idFromY: Y => String,
      tsFromX: X => Long, tsFromY: Y => Long)(
      implicit ex: Encoder[X], ey: Encoder[Y],
      et: Encoder[Tagged[X, Y]], es: Encoder[String],
      ej: Encoder[JoinState[X, Y]],
      ee: Encoder[Emitted[X, Y]]): Dataset[Emitted[X, Y]] =
    joined(dsx, dsy, keyFromX, keyFromY, idFromX, idFromY, tsFromX, tsFromY) {
      (key, seq, _, _, xs, ys) =>
        for (x <- xs.valuesIterator; y <- ys.values)
          yield Emitted(key, seq, Some(x), Some(y))
    }

  /** Streaming AS-OF (point-in-time) join — the production variant the
    * versioned-join state machinery was built for: every x row is
    * enriched with the y version IN EFFECT at x's own event time (the
    * latest y with ts(y) <= ts(x); ties count as "before", matching
    * the batch q_asof_join / DuckDB `ASOF JOIN ... ON x.ts >= y.ts`),
    * or None when no y existed yet — leakage-free feature attachment
    * over a live stream. Per trigger each touched key re-emits all its
    * xs with their in-effect y, so a LATE y (or a newer version of an
    * old y id) retroactively corrects every x it should have served:
    * the converged result (max seq per key) is arrival-order-free and
    * equals the batch as-of by construction. The per-key y timeline is
    * sorted once per trigger and each x resolves by binary search —
    * O((|xs|+|ys|)·log|ys|), never a rescan of y per x (the re-scan
    * shape is what makes naive range joins die at 100 TB). State holds
    * latest-per-id on both sides, exactly like the other variants; at
    * scale, y versions strictly SHADOWED below the watermark (a newer
    * y also at-or-below it) can be evicted — compose [[withEventTimeTtl]]
    * for whole-key retirement, the same knob the other variants use.
    *
    * TIE-BREAK INVARIANT: among equal-ts y versions the timeline
    * orders by id NUMERIC-AWARE (length, then lexicographic — numeric
    * order ONLY for non-negative decimal ids WITHOUT leading zeros:
    * "007" sorts after "12", and non-numeric ids order by length
    * before content; the pick stays deterministic either way), and
    * the search picks the boundary element; a SQL ASOF oracle picks
    * an ARBITRARY
    * row among equal-ts matches, so hash-comparison against such an
    * oracle additionally relies on per-key timestamp UNIQUENESS on
    * the y side (the driver fixtures hold it — event timestamps are
    * unique per user). Equal-ts correctness of the operator itself
    * does not depend on it: the choice is deterministic either way. */
  def asOf[X, Y](
      dsx: Dataset[X], dsy: Dataset[Y],
      keyFromX: X => String, keyFromY: Y => String,
      idFromX: X => String, idFromY: Y => String,
      tsFromX: X => Long, tsFromY: Y => Long)(
      implicit ex: Encoder[X], ey: Encoder[Y],
      et: Encoder[Tagged[X, Y]], es: Encoder[String],
      ej: Encoder[JoinState[X, Y]],
      ee: Encoder[Emitted[X, Y]]): Dataset[Emitted[X, Y]] =
    joined(dsx, dsy, keyFromX, keyFromY, idFromX, idFromY, tsFromX, tsFromY) {
      (key, seq, _, _, xs, ys) =>
        // (length, lexicographic) ≡ numeric ONLY for unpadded
        // non-negative decimal ids — see the tie-break scaladoc
        val timeline = ys.valuesIterator.toIndexedSeq
          .sortBy(y => (tsFromY(y), idFromY(y).length, idFromY(y)))
        xs.toSeq.sortBy(_._1).iterator.map { case (_, x) =>
          val xt = tsFromX(x)
          var lo = 0; var hi = timeline.length - 1; var best = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (tsFromY(timeline(mid)) <= xt) { best = mid; lo = mid + 1 }
            else hi = mid - 1
          }
          Emitted(key, seq, Some(x),
            if (best >= 0) Some(timeline(best)) else None)
        }
    }

  /** FORWARD as-of: each x resolves to the key's EARLIEST y version
    * at-or-AFTER its own timestamp (x.ts <= y.ts) — the streaming
    * next-action attribution shape (time-to-convert labels,
    * post-signup windows). Same state and convergence contract as
    * [[asOf]]; only the binary search flips (first y with ts >= x.ts
    * instead of last with ts <= x.ts). Forward resolution is
    * inherently retroactive in a stream — the answer for an x can
    * improve whenever an earlier-qualifying y arrives late — which is
    * exactly what the per-trigger re-emit + converged (max seq per
    * key) view already handles for the backward variant; no
    * watermark-delayed hold is needed because emissions are
    * corrections, not one-shot appends. */
  def asOfForward[X, Y](
      dsx: Dataset[X], dsy: Dataset[Y],
      keyFromX: X => String, keyFromY: Y => String,
      idFromX: X => String, idFromY: Y => String,
      tsFromX: X => Long, tsFromY: Y => Long)(
      implicit ex: Encoder[X], ey: Encoder[Y],
      et: Encoder[Tagged[X, Y]], es: Encoder[String],
      ej: Encoder[JoinState[X, Y]],
      ee: Encoder[Emitted[X, Y]]): Dataset[Emitted[X, Y]] =
    joined(dsx, dsy, keyFromX, keyFromY, idFromX, idFromY, tsFromX, tsFromY) {
      (key, seq, _, _, xs, ys) =>
        // (length, lexicographic) ≡ numeric ONLY for unpadded
        // non-negative decimal ids — see the tie-break scaladoc
        val timeline = ys.valuesIterator.toIndexedSeq
          .sortBy(y => (tsFromY(y), idFromY(y).length, idFromY(y)))
        xs.toSeq.sortBy(_._1).iterator.map { case (_, x) =>
          val xt = tsFromX(x)
          var lo = 0; var hi = timeline.length - 1; var best = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (tsFromY(timeline(mid)) >= xt) { best = mid; hi = mid - 1 }
            else lo = mid + 1
          }
          Emitted(key, seq, Some(x),
            if (best >= 0) Some(timeline(best)) else None)
        }
    }

  /** J3: left-outer nested — per trigger, the key's single latest x
    * (per-key dedup quirk) with all latest ys as a Seq (empty allowed);
    * keys with no x emit nothing (reference joins.scala:39-54, C3). */
  def leftOuterSeq[X, Y](
      dsx: Dataset[X], dsy: Dataset[Y],
      keyFromX: X => String, keyFromY: Y => String,
      idFromX: X => String, idFromY: Y => String,
      tsFromX: X => Long, tsFromY: Y => Long)(
      implicit ex: Encoder[X], ey: Encoder[Y],
      et: Encoder[Tagged[X, Y]], es: Encoder[String],
      ej: Encoder[JoinState[X, Y]],
      ee: Encoder[EmittedSeq[X, Y]]): Dataset[EmittedSeq[X, Y]] =
    joined[X, Y, EmittedSeq[X, Y]](dsx, dsy, keyFromX, keyFromY,
      idFromX, idFromY, tsFromX, tsFromY) { (key, seq, _, _, xs, ys) =>
      VersionedDedup.latestOne(xs.valuesIterator, tsFromX) match {
        case None    => Iterator.empty
        case Some(x) => Iterator.single(EmittedSeq(key, seq, Seq(x),
          ys.toSeq.sortBy(_._1).map(_._2)))
      }
    }

  /** J4: per-key cogroup — all latest versions on both sides as Seqs,
    * either possibly empty (reference joins.scala:56-70, C4). */
  def fullOuterSeq[X, Y](
      dsx: Dataset[X], dsy: Dataset[Y],
      keyFromX: X => String, keyFromY: Y => String,
      idFromX: X => String, idFromY: Y => String,
      tsFromX: X => Long, tsFromY: Y => Long)(
      implicit ex: Encoder[X], ey: Encoder[Y],
      et: Encoder[Tagged[X, Y]], es: Encoder[String],
      ej: Encoder[JoinState[X, Y]],
      ee: Encoder[EmittedSeq[X, Y]]): Dataset[EmittedSeq[X, Y]] =
    joined[X, Y, EmittedSeq[X, Y]](dsx, dsy, keyFromX, keyFromY,
      idFromX, idFromY, tsFromX, tsFromY) { (key, seq, _, _, xs, ys) =>
      Iterator.single(EmittedSeq(key, seq,
        xs.toSeq.sortBy(_._1).map(_._2), ys.toSeq.sortBy(_._1).map(_._2)))
    }

  /** Shared core: tagged union → keyed latest-wins upsert state →
    * per-trigger re-expansion via `expand`, which receives the key's
    * state maps BEFORE and AFTER the batch's upserts (pre-batch maps
    * let [[fullOuterDelta]] emit only changed rows; the full-result
    * variants ignore them). */
  private def joined[X, Y, U](
      dsx: Dataset[X], dsy: Dataset[Y],
      keyFromX: X => String, keyFromY: Y => String,
      idFromX: X => String, idFromY: Y => String,
      tsFromX: X => Long, tsFromY: Y => Long)(
      expand: (String, Long, Map[String, X], Map[String, Y],
        Map[String, X], Map[String, Y]) => Iterator[U])(
      implicit ex: Encoder[X], ey: Encoder[Y],
      et: Encoder[Tagged[X, Y]], es: Encoder[String],
      ej: Encoder[JoinState[X, Y]],
      ee: Encoder[U]): Dataset[U] = {

    val taggedRaw = dsx
      .map(x => Tagged[X, Y](keyFromX(x), Some(x), None,
        new java.sql.Timestamp(tsFromX(x))))
      .union(dsy.map(y => Tagged[X, Y](keyFromY(y), None, Some(y),
        new java.sql.Timestamp(tsFromY(y)))))

    val ttl = ttlConf.get() // captured at build time, serialized into the op
    val (tagged, timeoutConf) = ttl match {
      case Some(TtlConf(_, EventTimeTtl(delay))) =>
        (taggedRaw.withWatermark("ets", delay),
          GroupStateTimeout.EventTimeTimeout)
      case Some(TtlConf(_, ProcessingTimeTtl)) =>
        (taggedRaw, GroupStateTimeout.ProcessingTimeTimeout)
      case None => (taggedRaw, GroupStateTimeout.NoTimeout)
    }

    tagged.groupByKey(_.key).flatMapGroupsWithState(
      OutputMode.Update, timeoutConf) {
      (key: String, rows: Iterator[Tagged[X, Y]],
       state: GroupState[JoinState[X, Y]]) =>
        if (state.hasTimedOut) {
          // key retirement: drop the compacted maps; a later record
          // for this key rebuilds from scratch
          state.remove()
          Iterator.empty
        } else {
          val st = state.getOption.getOrElse(
            JoinState[X, Y](Map.empty, Map.empty, 0L))
          var xs = st.xs
          var ys = st.ys
          var maxEtsMs = Long.MinValue // latest event time in this batch
          rows.foreach { t =>
            maxEtsMs = math.max(maxEtsMs, t.ets.getTime)
            t.x.foreach { x =>
              val id = idFromX(x)
              // strict >: on equal ts the earlier-arrived version wins,
              // matching the reference (versionDeduplicator.scala:17,25)
              if (!xs.contains(id) || tsFromX(x) > tsFromX(xs(id)))
                xs = xs.updated(id, x)
            }
            t.y.foreach { y =>
              val id = idFromY(y)
              if (!ys.contains(id) || tsFromY(y) > tsFromY(ys(id)))
                ys = ys.updated(id, y)
            }
          }
          val seq = st.seq + 1
          state.update(JoinState(xs, ys, seq))
          val xs0 = st.xs
          val ys0 = st.ys
          ttl.foreach {
            case TtlConf(ms, ProcessingTimeTtl) => state.setTimeoutDuration(ms)
            case TtlConf(ms, _: EventTimeTtl) =>
              // Anchored at the LATER of the current watermark and the
              // newest event time this batch delivered for the key, so
              // the key retires once the watermark advances `ms` past
              // the data that last touched it (watermark-driven
              // cleanup, not wall clock). Anchoring at the watermark
              // alone is a first-batch footgun: the watermark is 0
              // during batch 1, so `0 + ms` is instantly passed once
              // real event times arrive, retiring every batch-1-only
              // key and restarting its emission seq — nondeterministic
              // under input chunking. The data-side anchor keeps the
              // timeout ≥ the key's own event-time frontier.
              val anchor = math.max(state.getCurrentWatermarkMs(), maxEtsMs)
              if (anchor > Long.MinValue)
                state.setTimeoutTimestamp(anchor + ms)
          }
          expand(key, seq, xs0, ys0, xs, ys)
        }
    }
  }
}
