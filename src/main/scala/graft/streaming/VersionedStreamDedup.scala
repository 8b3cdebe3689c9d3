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
}
