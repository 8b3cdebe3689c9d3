package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One cell-assigned vector arriving on the stream. */
final case class AssignedVec(vec_id: Long, cell: Long, e: Seq[Double],
                             nrm: Double)

/** One admit/reject decision emission. A vector's decision can flip
  * kept→dropped (never the reverse) when an earlier-id near-duplicate
  * arrives late; the per-cell seq makes the latest decision win at
  * convergence (max seq per vec_id), the same contract as the
  * streaming joins. */
final case class SemDecision(cell: Long, seq: Long, vec_id: Long,
                             kept: Boolean)

/** Per-cell state: the members seen so far (slim id + vector + norm)
  * and each member's current decision. */
final case class SemCellState(members: Seq[AssignedVec],
                              decided: Map[Long, Boolean], seq: Long)

/** Incremental SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public
  * paper): semantic near-duplicate admission decisions over a GROWING
  * embedding corpus, keyed by the coarse-quantizer cell.
  *
  * The batch rule (VectorOps dedup_semantic) is order-independent —
  * drop v iff ANY same-cell u with u.vec_id < v.vec_id has
  * cos(u, v) ≥ τ — so the streaming form needs no arrival-order
  * assumption: a newly arriving u can retract an already-admitted
  * later-id v, emitted here as a kept=false decision superseding the
  * earlier kept=true (CDC semantics, exactly what a downstream
  * materializer upserts). Work per batch is O(new × members-in-cell),
  * the SemDeDup candidate bound (never cross-cell, never all-pairs);
  * state is partitioned by cell across executors, and at 100 TB each
  * cell's members are the same vectors the batch recipe would hold in
  * one partition. Cosines replicate the batch/oracle arithmetic
  * bit-for-bit: sequential-order double dot product and HALF_UP
  * 6-decimal rounding before the threshold compare.
  */
object SemanticStreamDedup {

  private def sim(a: AssignedVec, b: AssignedVec): Double = {
    var s = 0.0
    var i = 0
    val n = a.e.length
    val ae = a.e
    val be = b.e
    while (i < n) { s += ae(i) * be(i); i += 1 }
    java.math.BigDecimal.valueOf(s / (a.nrm * b.nrm))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  def decisions(ds: Dataset[AssignedVec], threshold: Double)
      : Dataset[SemDecision] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.cell).flatMapGroupsWithState(
      OutputMode.Update, GroupStateTimeout.NoTimeout) {
      (cell: Long, rows: Iterator[AssignedVec],
       state: GroupState[SemCellState]) =>
        val st = state.getOption.getOrElse(
          SemCellState(Seq.empty, Map.empty, 0L))
        var members = st.members
        var decided = st.decided
        val changed = scala.collection.mutable.LinkedHashMap[Long, Boolean]()
        // ascending id within the batch: among new mutual near-dups the
        // lower id admits first and drops the higher, matching batch
        rows.toSeq.sortBy(_.vec_id).foreach { v =>
          if (!decided.contains(v.vec_id)) { // idempotent on re-delivery
            var vKept = true
            members.foreach { u =>
              if (sim(u, v) >= threshold) {
                if (u.vec_id < v.vec_id) vKept = false
                else if (decided.getOrElse(u.vec_id, true)) {
                  // late-arriving earlier-id near-dup retracts u
                  decided = decided.updated(u.vec_id, false)
                  changed.put(u.vec_id, false)
                }
              }
            }
            members = members :+ v
            decided = decided.updated(v.vec_id, vKept)
            changed.put(v.vec_id, vKept)
          }
        }
        val seq = st.seq + 1
        state.update(SemCellState(members, decided, seq))
        changed.iterator.map { case (id, kept) =>
          SemDecision(cell, seq, id, kept)
        }
    }
  }
}
