package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{SketchFunctions, TextFunctions}
import graft.streaming.{VersionedStreamDedup, VersionedStreamJoin}

/** A typed event row for the streaming paths: `ts_us` is the event
  * timestamp in epoch microseconds (the version — unique per
  * (user, type) in the driver data at every SF). */
final case class Ev(event_id: Long, user_id: Long, event_type: String,
                    ts_us: Long, value: Double)

/** Typed rows for the chained streaming join (s11): the reference's
  * 3-level A 1—N B 1—N C data model (GenJoinInput.scala:32-34) over
  * customer → orders → lineitem. `o_ver`/`l_ver` are Long versions;
  * `l_ver` = (shipdate epoch-days, price cents) packed so its strict
  * ordering equals the batch oracle's (l_shipdate DESC,
  * l_extendedprice DESC) dedup — the packed quadruple is verified
  * unique at sf0.01 and sf0.1, so streaming latest-wins is
  * arrival-order independent. */
final case class CustRow(c_custkey: Long, c_name: String)
final case class OrdRow(o_orderkey: Long, o_custkey: Long, o_ver: Long,
                        o_totalprice: Double)
/** One stage-1 (customer⋈orders) emission relayed to stage 2. Identity
  * for stage-2 upsert = `o_orderkey` (stable across the AB row's
  * lifetime); version = the stage-1 per-key emission `seq` (monotone
  * per customer, hence per order). */
final case class AbRel(seq: Long, c_custkey: Option[Long],
                       c_name: Option[String], o_orderkey: Long,
                       o_totalprice: Double)
final case class LiRow(l_orderkey: Long, l_linenumber: Int, l_ver: Long,
                       l_extendedprice: Double)

/** Slim streamed document row for incremental dedup (s19): content
  * fingerprint + id only — the text itself never enters streaming
  * state (at 100 TB the state holds fingerprints, not the corpus). */
final case class DocFp(doc_id: Long, fp: String)

/** One document's minhash signature (s21): the k=8 permutation minima.
  * Like [[DocFp]], this is all that enters streaming state — 9 longs
  * per document, not the text. */
final case class DocSig(doc_id: Long, h0: Long, h1: Long, h2: Long,
                        h3: Long, h4: Long, h5: Long, h6: Long, h7: Long)

/** One LSH band row (s24): band index, packed band value, doc id —
  * the unit of bucket membership in the streaming LSH state. */
final case class BandRow(bi: Int, bv: String, doc_id: Long)

/** One IVF cell assignment (s25): the unit of membership in the
  * streaming vector-index state — never the 64-dim vector itself. */
final case class AsgRow(vec_id: Long, cell: Long)
final case class PqCodeRow(vec_id: Long, s: Int, code: Long)

/** One packed sign-bit code row (s53): the 64-bit binary quantization
  * of a vector, split across two 32-bit words — the unit of the
  * streaming 1-bit index state (8 logical bytes per vector, the
  * smallest of the codec states). */
final case class SignCodeRow(vec_id: Long, lo: Long, hi: Long)

/** s45's slim event row (purchase stream under event-time TTL). */
final case class TtlEv(user_id: Long, event_id: Long, ts_us: Long)

/** One k-token-window fingerprint membership row (s36): gram md5,
  * doc id, and the window count of that gram within the doc — the
  * unit of exact-substring state; the text never enters state. */
final case class GramRow(g: String, doc_id: Long, cnt: Long)

/** One CDC chunk-hash membership row (s37): chunk md5, doc id, and
  * the chunk's multiplicity within the doc — the unit of streaming
  * storage-dedup state; the payload bytes never enter state. */
final case class ChunkRow(chunk_md5: String, doc_id: Long, cnt: Long)

/** One media-derived feature row (s50): the 48-dim pooled-pixel
  * vector per document — the unit of the streaming media index; the
  * payload bytes never enter state (at 100 TB the state holds 48
  * longs per asset, not the media lake). */
final case class MediaFeatRow(doc_id: Long, f: Seq[Long])

/** One k-token-window fingerprint POSITION row (s42): gram md5, doc
  * id, and the 1-based window-start positions of that gram within the
  * doc — [[GramRow]] widened just enough that the converged state can
  * reconstruct which spans to CUT (the trim transform needs where a
  * duplicated window sits, not only how often); the text itself still
  * never enters state. */
final case class GramPosRow(g: String, doc_id: Long, ps: Seq[Long])

/** One labeled embedding row (s63): vector + class label — the unit
  * of the streaming hard-negative-mining state (the one vector state
  * that must keep full precision AND the label, since mining scores
  * candidates exactly and filters on label mismatch). */
final case class EmbLabRow(vec_id: Long, label: Int, e: Seq[Double],
                           nrm: Double)

/** One decoded video-frame stat row (s57): per (doc, frame) the three
  * channel pixel sums — the unit of the streaming scene-cut state;
  * pixels decode and reduce inside the microbatch scan and never
  * enter state (at 100 TB the state holds 3 longs per frame, not the
  * frame bytes). */
final case class FrameStatRow(doc_id: Long, frame_idx: Long,
                              sum_r: Long, sum_g: Long, sum_b: Long)

/** Streaming operators, driven synchronously: the parquet tables are
  * range-split into chunked ingest directories and replayed through the
  * file source one file per trigger (so the engine sees multiple
  * microbatches, exercising state across triggers), and the final
  * answer is checked against the SAME batch DuckDB oracle as the batch
  * operators — the streaming engine must *converge* to the batch
  * result (the reference's own verification idea,
  * JoinSpec.scala:153-154, strengthened from count-equality to full
  * hash-equality). Nothing is driver-resident on any of these paths —
  * sources are file streams, sinks are foreachBatch parquet logs (no
  * `format("memory")` anywhere), and convergence runs as a batch plan
  * over the re-read log before only the small final answer is
  * materialized; MemoryStream-based deterministic replay lives in the
  * sbt harnesses (StreamJoinSpec) only.
  */
object StreamingOps {

  /** All streaming rows, grouped per family file (the registry's
    * driver-facing surface is unchanged — same names, same oracles). */
  def entries: Seq[Entry] =
    StreamJoinTwins.entries ++ StreamWindowTwins.entries ++
      StreamDedupTwins.entries ++ StreamSketchTwins.entries ++
      StreamTrainedTwins.entries ++ StreamServingTwins.entries
}
