package graft.core

import org.apache.spark.sql.DataFrame
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
  * Cross-engine determinism contract: cosines and centroid components
  * round to 6 decimals and argmax ties go to the lower centroid id, so
  * a SQL engine unrolling the same iterations (the DuckDB oracle of
  * `v_kmeans_assign`) reproduces the assignment bit-for-bit.
  */
object VectorTools {

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

  /** One Lloyd update: element-wise mean per cell (components rounded
    * to 6 decimals). Cells that lose every member drop out — k can
    * only shrink, which is Lloyd's standard empty-cell behavior. */
  def updateCentroids(vectors: DataFrame, asg: DataFrame): DataFrame =
    vectors.join(asg.select(col("id"), col("cell")), "id")
      .select(col("cell"), posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg(round(avg(col("v")), 6).as("c"))
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
