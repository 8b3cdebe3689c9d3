package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys: salt the skewed (large) side
  * into `factor` sub-keys and replicate the other side across all
  * salts, so one hot key spreads over `factor` reducers instead of
  * one straggler task. AQE's skew-join handles runtime-detected skew;
  * this is the explicit form for keys known to be pathological
  * (e.g. a null-key bucket or a celebrity entity at 100 TB).
  */
object SkewTools {

  /** Equi-join `left` (skewed side) with `right`, salted `factor`
    * ways. `spread` is any left-side expression that varies within a
    * key (it only routes rows; any deterministic value works).
    * Result equals the unsalted join exactly — verified against the
    * plain-join oracle in `q_salted_join`. */
  def saltedEquiJoin(left: DataFrame, right: DataFrame,
                     leftKeys: Seq[String], rightKeys: Seq[String],
                     spread: Column, factor: Int,
                     how: String = "inner"): DataFrame = {
    require(factor > 0)
    val l = left.withColumn("__lsalt", pmod(hash(spread), lit(factor)))
    val r = right.withColumn("__rsalt",
      explode(array((0 until factor).map(lit): _*)))
    val cond = leftKeys.zip(rightKeys)
      .map { case (a, b) => l(a) === r(b) }
      .reduce(_ && _) && l("__lsalt") === r("__rsalt")
    l.join(r, cond, how).drop("__lsalt", "__rsalt")
  }
}
