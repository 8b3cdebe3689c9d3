package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One emitted dedup row: the key's current latest versions (one per
  * id, ordered by id for determinism), stamped with the per-key
  * emission seq — same convergence contract as the streaming joins
  * (max seq per key = the final answer). */
final case class EmittedDedup[X](key: String, seq: Long, xs: Seq[X])

/** Per-key dedup state: latest version per id + emission counter. */
final case class DedupState[X](xs: Map[String, X], seq: Long)

/** Input wrapper carrying the event-time column the TTL variant
  * watermarks on (mirrors the joins' `Tagged.ets`). */
final case class Stamped[X](x: X, ets: java.sql.Timestamp)

/** Standalone streaming latest-wins deduplication — the reference's D2
  * (latest version per (key, id), versionDeduplicator.scala:36-57) as
  * its own streaming operator, for pipelines that need a compacted
  * upsert view without joining anything (reference D1's per-key form is
  * the join-side quirk, covered by VersionedStreamJoin.leftOuter).
  *
  * Note this is NOT Spark's streaming `dropDuplicates`, which keeps the
  * FIRST arrival of a key forever; CDC semantics need newest-version-
  * wins with late-but-older arrivals ignored, which is what the keyed
  * upsert state here does. State is bounded by live (key, id) pairs,
  * hash-partitioned by key across executors.
  */
object VersionedStreamDedup {

  /** Latest version per (key, id); per trigger each touched key
    * re-emits its full compacted set. */
  def latestPerKeyId[X](
      dsx: Dataset[X],
      keyFromX: X => String, idFromX: X => String, tsFromX: X => Long)(
      implicit ex: Encoder[X], es: Encoder[String],
      ej: Encoder[DedupState[X]],
      ee: Encoder[EmittedDedup[X]]): Dataset[EmittedDedup[X]] =
    dsx.groupByKey(keyFromX).flatMapGroupsWithState(
      OutputMode.Update, GroupStateTimeout.NoTimeout) {
      (key: String, rows: Iterator[X], state: GroupState[DedupState[X]]) =>
        val st = state.getOption.getOrElse(DedupState[X](Map.empty, 0L))
        var m = st.xs
        rows.foreach { x =>
          val id = idFromX(x)
          // strict >: on equal ts the earlier-arrived version wins,
          // matching the reference (versionDeduplicator.scala:44,53)
          if (!m.contains(id) || tsFromX(x) > tsFromX(m(id)))
            m = m.updated(id, x)
        }
        val seq = st.seq + 1
        state.update(DedupState(m, seq))
        Iterator.single(EmittedDedup(key, seq, m.toSeq.sortBy(_._1).map(_._2)))
    }

  /** [[latestPerKeyId]] with watermark-aligned key retirement whose
    * timers actually FIRE observably: when the event-time watermark
    * advances `ttlMs` past the data that last touched a key, the key's
    * state is dropped AND a TOMBSTONE emission (`xs` empty, seq
    * incremented) is produced — so an update-log consumer sees the
    * retraction instead of inferring it from silence (the joins'
    * `withEventTimeTtl` retires silently; a dedup view's downstream
    * needs the empty-set emission to invalidate its copy). A later
    * record rebuilds the key from scratch with `seq` restarting at 1,
    * so converged readers must order emissions by sink batch id, not
    * per-key seq.
    *
    * Timer anchoring matches the joins (max of current watermark and
    * the batch's newest event time — the first-batch zero-watermark
    * footgun fix); the same watermark-mode caveat applies: a record
    * older than watermark − `watermarkDelay` is silently dropped by
    * flatMapGroupsWithState. `etsMsFromX` supplies the epoch-ms event
    * time the watermark is built from. */
  def latestPerKeyIdWithEventTimeTtl[X](
      dsx: Dataset[X],
      keyFromX: X => String, idFromX: X => String, tsFromX: X => Long,
      etsMsFromX: X => Long, ttlMs: Long,
      watermarkDelay: String = "10 seconds")(
      implicit ex: Encoder[X], est: Encoder[Stamped[X]],
      es: Encoder[String], ej: Encoder[DedupState[X]],
      ee: Encoder[EmittedDedup[X]]): Dataset[EmittedDedup[X]] = {
    require(ttlMs > 0, s"TTL must be positive, got $ttlMs")
    dsx.map(x => Stamped(x, new java.sql.Timestamp(etsMsFromX(x))))
      .withWatermark("ets", watermarkDelay)
      .groupByKey(s => keyFromX(s.x))
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[Stamped[X]],
         state: GroupState[DedupState[X]]) =>
          if (state.hasTimedOut) {
            val seq = state.get.seq + 1
            state.remove()
            Iterator.single(EmittedDedup(key, seq, Seq.empty[X]))
          } else {
            val st = state.getOption.getOrElse(DedupState[X](Map.empty, 0L))
            var m = st.xs
            var maxEtsMs = Long.MinValue
            rows.foreach { s =>
              maxEtsMs = math.max(maxEtsMs, s.ets.getTime)
              val id = idFromX(s.x)
              // strict >: on equal ts the earlier-arrived version wins
              if (!m.contains(id) || tsFromX(s.x) > tsFromX(m(id)))
                m = m.updated(id, s.x)
            }
            val seq = st.seq + 1
            state.update(DedupState(m, seq))
            val anchor = math.max(state.getCurrentWatermarkMs(), maxEtsMs)
            if (anchor > Long.MinValue)
              state.setTimeoutTimestamp(anchor + ttlMs)
            Iterator.single(
              EmittedDedup(key, seq, m.toSeq.sortBy(_._1).map(_._2)))
          }
      }
  }
}
