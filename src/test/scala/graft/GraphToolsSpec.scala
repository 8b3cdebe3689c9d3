package graft

import graft.core.GraphTools

/** Property test for the distributed connected-components operator:
  * on seeded random graphs the min-label-propagation fixpoint must
  * equal an in-memory union-find's components (canonicalized to min
  * member id). Covers shapes the dedup data doesn't: long chains
  * (diameter stress), stars, singleton edges, multi-component mixes. */
class GraphToolsSpec extends SparkTestBase {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Int, Int)]): Map[Int, Int] = {
    val parent = scala.collection.mutable.Map.empty[Int, Int]
    def find(x: Int): Int = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // canonicalize: component label = min member id
    val byRoot = nodes.groupBy(find)
    byRoot.values.flatMap { members =>
      val lab = members.min
      members.map(_ -> lab)
    }.toMap
  }

  private def check(edges: Seq[(Int, Int)]): Unit = {
    val expected = unionFind(0, edges)
    val got = GraphTools.connectedComponents(
        edges.toDF("a", "b"), "a", "b")
      .as[(Int, Int)].collect().toMap
    assert(got == expected)
    val gotLogN = GraphTools.connectedComponentsLogN(
        edges.toDF("a", "b"), "a", "b")
      .as[(Int, Int)].collect().toMap
    assert(gotLogN == expected)
    // the library's own driver-side union-find (the incremental CC
    // quotient fast path) must agree with both distributed operators
    val gotUf = GraphTools.unionFindComponents(
        edges.map { case (a, b) => (a.toLong, b.toLong) })
      .map { case (k, v) => (k.toInt, v.toInt) }
    assert(gotUf == expected)
  }

  test("random graphs match union-find components") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val n = 60
      val edges = (1 to 80).map(_ => (rnd.nextInt(n), rnd.nextInt(n)))
        .filter { case (a, b) => a != b }
      check(edges)
    }
  }

  test("long chain (diameter stress) collapses to one component") {
    val chain = (0 until 40).map(i => (i, i + 1))
    val got = GraphTools.connectedComponents(chain.toDF("a", "b"), "a", "b")
      .as[(Int, Int)].collect().toMap
    assert(got.size == 41 && got.values.forall(_ == 0))
  }

  test("disjoint stars keep separate min labels") {
    val edges = Seq((10, 11), (10, 12), (10, 13), (20, 21), (20, 22), (5, 10))
    check(edges)
  }

  test("logN contraction handles diameter beyond the propagation cap") {
    // a 120-edge chain has diameter 120 > the propagation default cap
    // (50 rounds, which now throws); the contraction converges in
    // O(log n) rounds regardless of diameter
    val chain = (0 until 120).map(i => (i, i + 1))
    val got = GraphTools.connectedComponentsLogN(
        chain.toDF("a", "b"), "a", "b", maxRounds = 12)
      .as[(Int, Int)].collect().toMap
    assert(got.size == 121 && got.values.forall(_ == 0))
    assertThrows[IllegalArgumentException] {
      GraphTools.connectedComponents(chain.toDF("a", "b"), "a", "b",
          maxRounds = 10)
        .count()
    }
  }

  test("logN contraction: self-loops and singleton edges") {
    val edges = Seq((3, 3), (7, 8))
    val got = GraphTools.connectedComponentsLogN(
        edges.toDF("a", "b"), "a", "b")
      .as[(Int, Int)].collect().toMap
    assert(got == Map(3 -> 3, 7 -> 7, 8 -> 7))
  }
}
