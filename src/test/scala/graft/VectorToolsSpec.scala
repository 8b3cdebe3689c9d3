package graft

import graft.core.VectorTools

/** Behavioral checks on the Lloyd building blocks beyond the
  * oracle-hashed v_kmeans_assign query: separation on clusterable
  * data, totality of the assignment, and label provenance. */
class VectorToolsSpec extends SparkTestBase {
  import spark.implicits._

  test("lloyd separates two clusters and assignment is total") {
    // two tight clusters around orthogonal directions; seeds (as a
    // kmeans++-style far-apart seeding would pick) one from each
    val vecs = ((0 until 20).map(i =>
        (i.toLong, Array(1.0 + 0.01 * i, 0.02 * i, 0.0))) ++
      (20 until 40).map(i =>
        (i.toLong, Array(0.0, 0.02 * (i - 20), 1.0 + 0.01 * (i - 20)))))
      .toDF("id", "e")
    val seed = vecs.filter($"id".isin(0L, 20L))
      .select($"id".as("cid"), $"e".as("ce"))
    val trained = VectorTools.lloyd(vecs, seed, 2)
    val asg = VectorTools.assignCells(vecs, trained).collect()
    assert(asg.length == 40, "every vector assigned exactly once")
    val byCell = asg.groupBy(_.getLong(1))
      .view.mapValues(_.map(_.getLong(0)).toSet).toMap
    assert(byCell.keySet.subsetOf(Set(0L, 20L)),
      s"cell labels must come from the seed ids: ${byCell.keySet}")
    assert(byCell == Map(0L -> (0L until 20L).toSet,
      20L -> (20L until 40L).toSet), s"clusters not separated: $byCell")
  }

  test("centroid components are the documented fixed-point mean, " +
    "bit-exactly, including half-boundary inputs") {
    // components chosen ON and AROUND the 10^-6 half boundary — the
    // inputs where the retired round(avg, 6) lane could flake on
    // cross-engine accumulation-order ulps. The integer lane's
    // contract is stronger than tolerance: the emitted component must
    // EQUAL the scalar evaluation of the documented formula
    // ((Σ floor(v*1e6 + 0.5)) / n) / 1e6, bit for bit.
    val vs = Seq(0.0000005, 0.0000015, 0.1234565, -0.0000005, 0.75)
    val vecs = vs.zipWithIndex
      .map { case (v, i) => (i.toLong, Array(v)) }.toDF("id", "e")
    val asg = vs.indices.map(i => (i.toLong, 7L)).toDF("id", "cell")
    val got = VectorTools.updateCentroids(vecs, asg).collect()
    val expected =
      (vs.map(v => math.floor(v * 1e6 + 0.5).toLong).sum.toDouble /
        vs.length) / 1e6
    assert(got.length == 1 && got(0).getLong(0) == 7L)
    val c = got(0).getSeq[Double](1)
    assert(c == Seq(expected),
      s"component ${c.map(_.toString)} != exact ${expected.toString}")
  }

  test("empty cells drop out of the centroid table") {
    val vecs = (0 until 10).map(i => (i.toLong, Array(1.0, 0.01 * i)))
      .toDF("id", "e")
    // second seed is anti-aligned with everything → wins nothing
    val seed = Seq((0L, Array(1.0, 0.0)), (99L, Array(-1.0, 0.0)))
      .toDF("cid", "ce")
    val trained = VectorTools.lloyd(vecs, seed, 1)
    assert(trained.select("cid").as[Long].collect().toSet == Set(0L))
  }
}
