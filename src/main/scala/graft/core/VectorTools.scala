package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Distributed k-means building blocks (Lloyd's algorithm) over
  * DataFrames of (id, e: array<double>) — the training loop behind an
  * IVF ANN index (the `ann_ivf_topk` query probes exactly the cell
  * structure these functions train). Both steps are pure DataFrame
  * plans:
  *
  *  - assignment shuffles SLIM (id, cid, csim) rows only — vectors
  *    stay in the map-side scan against a broadcast centroid table;
  *  - the centroid update is posexplode + partial agg on (cell, pos),
  *    never a driver-side vector sum (`v_label_centroids` is this same
  *    shape keyed by label).
  *
  * Cross-engine determinism contract: cosines round to 6 decimals,
  * argmax ties go to the lower centroid id, and centroid components
  * are FIXED-POINT means — each input component micro-quantizes
  * scan-locally (floor(v·10⁶ + 0.5), an exact integer), the sums are
  * exact integer arithmetic (order-independent, unlike a double
  * accumulation whose partition-order ulps could flip a component
  * sitting exactly on a rounding boundary), and the mean is the ONE
  * double division (S/n)/10⁶ computed in the same operation order by
  * both engines — so a SQL engine unrolling the same iterations (the
  * DuckDB oracle of `v_kmeans_assign`) reproduces the assignment
  * bit-for-bit, with no accumulation-order hazard anywhere.
  */
object VectorTools {

  /** The fixed-point micro grid for centroid statistics (10⁻⁶ — the
    * same resolution the retired round(·, 6) lane targeted). */
  private val microGrid = 1e6

  /** Nearest-centroid assignment by cosine: (id, cell, csim).
    * vectors: (id, e array<double>); centroids: (cid, ce array<double>). */
  def assignCells(vectors: DataFrame, centroids: DataFrame): DataFrame =
    assignFull(vectors, centroids)
      .select(col("id"), col("cell"), col("csim"))

  /** Scan-local assignment carrying the vector through: (id, e, cell,
    * csim). The k-way argmax runs per ROW against a one-row broadcast
    * array of the k centroids, so the E-step plans with NO exchange at
    * all — the former shape fanned every vector out to k scored rows
    * and funneled them back through a per-id SortAggregate pair around
    * a hash exchange (plans/r19/v_kmeans_assign_before.txt: Exchange +
    * 2× Sort for the argmax alone), which at corpus scale shuffles one
    * slim row per vector per Lloyd round for no information the scan
    * didn't already hold (guide §2.4: remove shuffles outright).
    * Arithmetic is bit-identical to the former shape and the DuckDB
    * oracle: the same round(dot/(‖e‖·‖c‖), 6) per (vector, centroid)
    * — norms hoisted, not re-derived — and the same argmax order
    * (csim DESC, cid ASC) via the lexicographic struct max over
    * (csim, -cid); cid is unique, so the winner is unique. The
    * centroid array is sorted (deterministic plan input) and an EMPTY
    * centroid table yields no assignment rows, exactly as the former
    * crossJoin did. */
  private def assignFull(vectors: DataFrame,
                         centroids: DataFrame): DataFrame = {
    val centArr = broadcast(
      centroids
        .select(struct(col("cid"), col("ce"),
          VectorFunctions.norm(col("ce")).as("cn")).as("c"))
        .agg(sort_array(collect_list(col("c"))).as("cents"))
        .filter(size(col("cents")) > 0))
    vectors
      .select(col("id"), col("e"), VectorFunctions.norm(col("e")).as("nrm"))
      .crossJoin(centArr)
      .select(col("id"), col("e"),
        array_max(transform(col("cents"), c =>
          struct(
            round(VectorFunctions.dot(col("e"), c.getField("ce")) /
              (col("nrm") * c.getField("cn")), 6).as("csim"),
            (-c.getField("cid")).as("ncid")))).as("t"))
      .select(col("id"), col("e"),
        (-col("t.ncid")).as("cell"), col("t.csim").as("csim"))
  }

  /** Micro-quantize one vector component for the M-step sums: an
    * exact small integer (Spark's floor on double returns LongType),
    * computed scan-locally by the identical formula on both engines.
    * Shared with the streamed sufficient-statistics twins (s65/s66),
    * whose relay must quantize identically. */
  def microQuantize(v: Column): Column =
    floor(v * lit(microGrid) + lit(0.5))

  /** The M-step mean from exact integer sufficient statistics:
    * (CAST(Σq AS DOUBLE) / n) / 10⁶ — both divisions are single IEEE
    * operations on bit-identical inputs, so the resulting component is
    * bit-identical cross-engine with no rounding step at all. Shared
    * with the streamed twins' converged-stat fold. */
  def microMean(sumQ: Column, n: Column): Column =
    sumQ.cast("double") / n / lit(microGrid)

  /** One Lloyd update: element-wise fixed-point mean per cell (exact
    * integer micro sums, one deterministic division — see the
    * determinism contract above). Cells that lose every member drop
    * out — k can only shrink, which is Lloyd's standard empty-cell
    * behavior. */
  def updateCentroids(vectors: DataFrame, asg: DataFrame): DataFrame =
    statMeans(vectors.join(asg.select(col("id"), col("cell")), "id"))

  /** The M-step statistic over rows already carrying (cell, e): fixed-
    * point mean per (cell, pos), folded back to centroid arrays. The
    * ONLY exchange of a fused Lloyd round (the 1,024-group partial
    * agg); shared by [[updateCentroids]] (which re-attaches `e` by id
    * for callers holding a bare assignment) and the fused [[lloyd]]
    * path (where the scan-local assignment already carries `e`, so no
    * join exists to pay for). */
  private def statMeans(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg(microMean(sum(microQuantize(col("v"))), count(lit(1))).as("c"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("cell").as("cid"),
        expr("transform(pc, x -> x.c)").as("ce"))

  /** `iterations` full Lloyd rounds from a seed centroid table.
    * localCheckpoint truncates the growing plan between rounds (the
    * GraphTools discipline; a real checkpoint/table at 100 TB). Each
    * round is ONE exchange (the (cell, pos) stat agg): the scan-local
    * E-step carries `e` through, so the former per-round argmax
    * exchange AND the vectors⋈assignment re-attach join both
    * disappear (guide §2.4; plan diff in plans/r19/
    * v_kmeans_lloyd3_{before,after}.txt). */
  def lloyd(vectors: DataFrame, seed: DataFrame, iterations: Int): DataFrame = {
    var cent = seed
    for (_ <- 0 until iterations)
      cent = statMeans(assignFull(vectors, cent)).localCheckpoint()
    cent
  }
}
