package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph utilities for dedup pipelines.
  *
  * Every `localCheckpoint` in this file truncates iteration lineage
  * over SLIM (id, label) or (src, dst) pairs — never payload data. At
  * cluster scale the substitution is a reliable checkpoint
  * (`spark.sparkContext.setCheckpointDir` on shared storage +
  * `.checkpoint()`): localCheckpoint is executor-pinned and not
  * fault-tolerant, which is acceptable only single-JVM (here) or where
  * recomputing the round is cheap. */
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
      // the change flag rides the update row itself, so the convergence
      // count below is a NARROW scan of the just-checkpointed blocks —
      // not the extra join-plus-shuffle job per round it used to be
      // (per-round fixed job cost dominates the incremental-CC batches
      // that run this over near-empty inputs)
      val updated = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(col("id"),
          least(col("lab"), coalesce(col("nlab"), col("lab"))).as("lab"),
          (coalesce(col("nlab"), col("lab")) < col("lab")).as("chg"))
        .localCheckpoint()
      changed = updated.filter(col("chg")).count()
      labels = updated.select(col("id"), col("lab"))
      rounds += 1
    }
    // a silent exit on the round cap would return plausible-looking but
    // WRONG labels for a graph whose diameter exceeds maxRounds
    require(changed == 0,
      s"connectedComponents did not converge in $maxRounds rounds " +
        s"($changed labels still changing); raise maxRounds or use " +
        "connectedComponentsLogN for high-diameter graphs")
    labels.select(col("id"), col("lab").as("component"))
  }

  /** In-memory min-label connected components over a SMALL edge list —
    * the driver-side fast path for batch-bounded quotient graphs (the
    * incremental CC engine maps a microbatch's edges into label space,
    * whose size is bounded by the batch, then contracts the quotient
    * here in microseconds instead of through O(diameter) Spark rounds;
    * see StreamDedupTwins.applyCcBatch). Union-find with
    * path compression, always attaching the larger root under the
    * smaller, so every root IS its component's minimum id — the same
    * deterministic contract as [[connectedComponents]]
    * (property-tested against it in GraphToolsSpec). Never call this
    * with data-scale edge lists; callers must bound the input by
    * construction or by an explicit threshold. */
  def unionFindComponents(edges: Iterable[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    for ((a, b) <- edges) {
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keysIterator.map(k => k -> find(k)).toMap
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC 2014): rounds are bounded O(log n) in the
    * NUMBER OF NODES, independent of graph diameter — the scale path
    * for adversarial shapes (long chains, lattices) where min-label
    * propagation's O(diameter) rounds would dominate.
    *
    * Edges are kept canonically oriented (larger id, smaller id); both
    * operations are one groupBy-min + one equi-join over the edge
    * list, fully distributed, with the driver carrying only change
    * counters. At the fixpoint the edge set is a star forest: every
    * non-root node carries exactly one edge to its component's minimum
    * id.
    *
    *  - large-star(u): every strictly-larger neighbor of u re-points
    *    to the minimum of u's closed neighborhood;
    *  - small-star(u): u and its smaller neighbors all re-point to the
    *    minimum of u's smaller neighborhood.
    *
    * Returns the same contract as [[connectedComponents]]: one row per
    * node appearing in any edge, component = min reachable id. The two
    * operators are property-tested against each other and against an
    * in-memory union-find (GraphToolsSpec).
    */
  def connectedComponentsLogN(edges: DataFrame, src: String, dst: String,
                              maxRounds: Int = 50): DataFrame = {
    val raw = edges.select(col(src).as("s"), col(dst).as("d"))
    val nodes = raw.select(col("s").as("id"))
      .union(raw.select(col("d").as("id"))).distinct().localCheckpoint()
    // canonical orientation: u = larger endpoint, v = smaller
    var e = raw.filter(col("s") =!= col("d"))
      .select(greatest(col("s"), col("d")).as("u"),
        least(col("s"), col("d")).as("v"))
      .distinct().localCheckpoint()
    // one-pass signature (cardinality, order-insensitive hash XOR) for
    // the fixpoint test: both rounds' edge sets are DISTINCT, so
    // equal signatures ⟺ equal sets up to a 64-bit collision
    // (≈2⁻⁶⁴ per round — far below any hardware error rate). Replaces
    // an except-plus-count (a full extra shuffle per round). XOR, not
    // sum: commutative AND overflow-free under ANSI arithmetic.
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var (eCount, eSig) = signature(e)
    var rounds = 0
    var converged = eCount == 0L
    while (!converged && rounds < maxRounds) {
      // LARGE-STAR: for each node u, every neighbor v > u re-points to
      // m = min(N(u) ∪ {u}). Each undirected edge is emitted exactly
      // once — from the perspective of its smaller endpoint — so the
      // output IS the new edge set. m ≤ u < v keeps orientation.
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val lsMin = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u").as("lu"), least(col("mn"), col("u")).as("m"))
      val ls = sym.filter(col("v") > col("u"))
        .join(lsMin, col("u") === col("lu"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // SMALL-STAR: for each node u over its smaller neighbors N,
      // m = min(N); emit (v, m) for v ∈ N \ {m} and (u, m). Orientation
      // is preserved (v > m, u > m); edge count per node = |N|.
      val ssMin = ls.groupBy(col("u")).agg(min(col("v")).as("m"))
        .select(col("u").as("su"), col("m"))
      val ss = ls.join(ssMin, col("u") === col("su"))
        .select(
          when(col("v") === col("m"), col("u")).otherwise(col("v")).as("u"),
          col("m").as("v"))
        .distinct().localCheckpoint()
      // fixpoint ⟺ edge set unchanged (signature equality over the
      // distinct sets); a star forest maps to itself under both ops
      val (ssCount, ssSig) = signature(ss)
      converged = ssCount == eCount && ssSig == eSig
      e = ss
      eCount = ssCount
      eSig = ssSig
      rounds += 1
    }
    require(converged || eCount == 0L,
      s"connectedComponentsLogN did not converge in $maxRounds rounds")
    // star forest: every non-root appears exactly once as the larger
    // endpoint, pointing at its component min; roots (and nodes with
    // only self-edges) label themselves
    nodes.join(e.select(col("u").as("id"), col("v").as("lab")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("lab"), col("id")).as("component"))
  }
}
