package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph utilities for dedup pipelines. */
object GraphTools {

  /** Connected components over an undirected edge list by min-label
    * propagation: every node starts labeled with itself; each round
    * takes the min of its own label and its neighbors' labels; at the
    * fixpoint every node carries the minimum id reachable from it —
    * a unique, deterministic labeling regardless of execution order.
    *
    * Scale shape: each round is one equi-join + one partial-min agg on
    * (id, label) pairs — all data stays distributed, the driver loop
    * carries only a change counter; `localCheckpoint` truncates the
    * growing lineage per round (a real checkpoint at production scale).
    * Rounds = graph diameter; near-dup clusters are shallow by nature.
    * For adversarial diameters use the large-star/small-star
    * contraction (CC-in-MapReduce) to bound rounds at O(log n) — not
    * needed at dedup-graph shapes.
    *
    * @param edges DataFrame with two id columns (undirected; each pair
    *              listed once is sufficient)
    * @return (id, component) — one row per node appearing in any edge,
    *         component = min reachable id
    */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
                          maxRounds: Int = 50): DataFrame = {
    val pairs = edges.select(col(src).as("s"), col(dst).as("d"))
    val both = pairs
      .union(pairs.select(col("d").as("s"), col("s").as("d")))
      .localCheckpoint()
    var labels = both.select(col("s").as("id")).distinct()
      .withColumn("lab", col("id")).localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val nbrMin = both.join(labels, both("d") === labels("id"))
        .groupBy(both("s").as("nid")).agg(min(col("lab")).as("nlab"))
      val updated = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(col("id"),
          least(col("lab"), coalesce(col("nlab"), col("lab"))).as("lab"))
        .localCheckpoint()
      changed = updated.as("u")
        .join(labels.as("l"), col("u.id") === col("l.id"))
        .filter(col("u.lab") =!= col("l.lab")).count()
      labels = updated
      rounds += 1
    }
    // a silent exit on the round cap would return plausible-looking but
    // WRONG labels for a graph whose diameter exceeds maxRounds
    require(changed == 0,
      s"connectedComponents did not converge in $maxRounds rounds " +
        s"($changed labels still changing); raise maxRounds or use a " +
        "log-bounded contraction for high-diameter graphs")
    labels.select(col("id"), col("lab").as("component"))
  }
}
