package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A versioned-upsert table: a DataFrame plus the three logical
  * attributes the reference engine takes as extractor lambdas
  * (reference: src/main/scala/flink_perf/joins.scala:11-13) —
  * join `key` columns, primary `id` columns, version `ts` — plus a
  * deterministic tiebreak (see [[VersionedDedup]]).
  */
final case class VersionedTable(df: DataFrame, keys: Seq[Column],
                                ids: Seq[Column], ts: Column,
                                tiebreak: Column) {
  /** Latest version per (key, id) — D2 dedup. */
  def latestPerKeyId: DataFrame =
    VersionedDedup.latestPerKeyId(df, keys, ids, ts, tiebreak)
  /** Latest version per key alone — D1 X-side dedup. */
  def latestPerKey: DataFrame =
    VersionedDedup.latestPerKey(df, keys, ts, tiebreak)
}

/** Batch versioned joins — the reference's four public operators plus
  * its untested-but-present inner join, re-expressed declaratively so
  * Catalyst plans them (shuffle or broadcast as sizes dictate):
  *
  *  - J1 fullOuter     (reference joins.scala:10-23, cgf C1)
  *  - J2 leftOuter     (reference joins.scala:24-37, cgf C2)
  *  - J3 leftOuterSeq  (reference joins.scala:39-54, cgf C3)
  *  - J4 fullOuterSeq  (reference joins.scala:56-70, cgf C4)
  *  - J5 inner         (reference cogroupFunctions.scala:74-87, C5)
  *
  * Each dedups both sides to latest versions first (dedup-before-expand,
  * the reference's partial-agg analog, cogroupFunctions.scala:11,37,54,68,78)
  * and then joins on the key columns. At scale this is two key-partitioned
  * shuffles (one per side's window dedup) that Catalyst reuses for the
  * join exchange, so the join itself adds no extra shuffle of the big
  * sides; a small deduped side still qualifies for broadcast via AQE.
  *
  * Column-name collisions between the two sides must be resolved by the
  * caller (alias/prefix) — these operators join on equal *values* of the
  * key columns, by name lists `leftKeyNames`/`rightKeyNames`.
  */
object VersionedJoins {

  /** J1: per key, cross product of latest-version xs × latest-version ys;
    * unmatched sides null. */
  def fullOuter(x: VersionedTable, y: VersionedTable,
                leftKeyNames: Seq[String], rightKeyNames: Seq[String]): DataFrame =
    joinOn(x.latestPerKeyId, y.latestPerKeyId, leftKeyNames, rightKeyNames,
      "full_outer")

  /** J2: at most one x per key (latest by ts over the whole key — the
    * reference's documented quirk); keys with no x are dropped. */
  def leftOuter(x: VersionedTable, y: VersionedTable,
                leftKeyNames: Seq[String], rightKeyNames: Seq[String]): DataFrame =
    joinOn(x.latestPerKey, y.latestPerKeyId, leftKeyNames, rightKeyNames,
      "left_outer")

  /** J3: as J2 but the y side nested: one row per x with all matching
    * latest-version ys collected (empty array if none). Caller chooses
    * what to collect via `collectExpr` (e.g. sorted ids, or structs) and
    * its output name. */
  def leftOuterSeq(x: VersionedTable, y: VersionedTable,
                   leftKeyNames: Seq[String], rightKeyNames: Seq[String],
                   collectExpr: Column, collectedName: String): DataFrame = {
    val ys = y.latestPerKeyId
      .groupBy(rightKeyNames.map(col): _*)
      .agg(collectExpr.as(collectedName))
    val emptyArr = array().cast(ys.schema(collectedName).dataType)
    joinOn(x.latestPerKey, ys, leftKeyNames, rightKeyNames, "left_outer")
      .withColumn(collectedName, coalesce(col(collectedName), emptyArr))
  }

  /** J4: per-key cogroup — both sides collected to arrays of latest
    * versions; either may be empty. */
  def fullOuterSeq(x: VersionedTable, y: VersionedTable,
                   leftKeyNames: Seq[String], rightKeyNames: Seq[String],
                   collectLeft: Column, leftName: String,
                   collectRight: Column, rightName: String): DataFrame = {
    val xs = x.latestPerKeyId.groupBy(leftKeyNames.map(col): _*)
      .agg(collectLeft.as(leftName))
    val ys = y.latestPerKeyId.groupBy(rightKeyNames.map(col): _*)
      .agg(collectRight.as(rightName))
    val emptyL = array().cast(xs.schema(leftName).dataType)
    val emptyR = array().cast(ys.schema(rightName).dataType)
    joinOn(xs, ys, leftKeyNames, rightKeyNames, "full_outer")
      .withColumn(leftName, coalesce(col(leftName), emptyL))
      .withColumn(rightName, coalesce(col(rightName), emptyR))
  }

  /** J1 for NULLABLE-key sides at scale (the j6 chain's second join:
    * customers without orders carry a null o_orderkey). A null key can
    * never satisfy an equi-join condition, yet a plain full-outer
    * hashes every null-key row into ONE shuffle partition — and AQE
    * cannot rescue it: OptimizeSkewedJoin splits inner/semi/one-sided
    * outer joins only, never FULL OUTER (splitting would duplicate
    * the preserved null-padded rows). So the fix must be static: split
    * each side into a null-key arm and a join arm BEFORE any exchange.
    * The join arm dedups + joins exactly as [[fullOuter]]; the null
    * arm dedups clustered by its ids (its keys are all null — see
    * VersionedDedup.latestPerKeyIdClusteredBy) and is unioned into the
    * output null-padded on the other side. Result values are identical
    * to [[fullOuter]]; no stage sees a null hot partition, and the
    * isnotnull filters reach the scans. */
  def fullOuterNullSplit(x: VersionedTable, y: VersionedTable,
                         leftKeyNames: Seq[String],
                         rightKeyNames: Seq[String]): DataFrame = {
    val (lJoin, lNull) = splitNullKeys(x, leftKeyNames)
    val (rJoin, rNull) = splitNullKeys(y, rightKeyNames)
    val joined = joinOn(lJoin, rJoin, leftKeyNames, rightKeyNames,
      "full_outer")
    val lPadded = lNull.select(lNull.columns.map(col) ++
      rJoin.schema.fields.map(f =>
        lit(null).cast(f.dataType).as(f.name)): _*)
    val rPadded = rNull.select(lJoin.schema.fields.map(f =>
      lit(null).cast(f.dataType).as(f.name)) ++
      rNull.columns.map(col): _*)
    joined.unionByName(lPadded).unionByName(rPadded)
  }

  /** (deduped join arm, deduped null arm) of a versioned side: rows
    * with any null key can never match, and their dedup groups never
    * straddle the split (the keys are part of the group identity). */
  private def splitNullKeys(t: VersionedTable,
                            keyNames: Seq[String]): (DataFrame, DataFrame) = {
    val anyNull = keyNames.map(col(_).isNull).reduce(_ || _)
    val joinArm = t.copy(df = t.df.filter(!anyNull)).latestPerKeyId
    val nullArm = VersionedDedup.latestPerKeyIdClusteredBy(
      t.df.filter(anyNull), t.ids, t.keys, t.ids, t.ts, t.tiebreak)
    (joinArm, nullArm)
  }

  /** J5 (reference C5, promoted to first-class): latest-version inner join. */
  def inner(x: VersionedTable, y: VersionedTable,
            leftKeyNames: Seq[String], rightKeyNames: Seq[String]): DataFrame =
    joinOn(x.latestPerKeyId, y.latestPerKeyId, leftKeyNames, rightKeyNames,
      "inner")

  private def joinOn(l: DataFrame, r: DataFrame,
                     lk: Seq[String], rk: Seq[String], how: String): DataFrame = {
    require(lk.length == rk.length, "key arity mismatch")
    val cond = lk.zip(rk).map { case (a, b) => l(a) === r(b) }
      .reduce(_ && _)
    l.join(r, cond, how)
  }
}
