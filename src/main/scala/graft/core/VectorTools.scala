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
  def assignCells(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = vectors.crossJoin(broadcast(
        centroids.select(col("cid"), col("ce"),
          VectorFunctions.norm(col("ce")).as("cn"))))
      .select(col("id"),
        round(VectorFunctions.dot(col("e"), col("ce")) /
          (VectorFunctions.norm(col("e")) * col("cn")), 6).as("csim"),
        col("cid"))
    scored.groupBy(col("id"))
      .agg(max_by(struct(col("cid"), col("csim")),
        struct(col("csim"), -col("cid"))).as("t"))
      .select(col("id"), col("t.cid").as("cell"), col("t.csim").as("csim"))
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
    vectors.join(asg.select(col("id"), col("cell")), "id")
      .select(col("cell"), posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg(microMean(sum(microQuantize(col("v"))), count(lit(1))).as("c"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("cell").as("cid"),
        expr("transform(pc, x -> x.c)").as("ce"))

  /** `iterations` full Lloyd rounds from a seed centroid table.
    * localCheckpoint truncates the growing plan between rounds (the
    * GraphTools discipline; a real checkpoint/table at 100 TB). */
  def lloyd(vectors: DataFrame, seed: DataFrame, iterations: Int): DataFrame = {
    var cent = seed
    for (_ <- 0 until iterations)
      cent = updateCentroids(vectors, assignCells(vectors, cent))
        .localCheckpoint()
    cent
  }
}
