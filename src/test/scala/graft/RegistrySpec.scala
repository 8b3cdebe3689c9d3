package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

import graft.queries.Registry

/** Contract checks on the driver-facing query registry. */
class RegistrySpec extends SparkTestBase {

  // overridable so the suite is not coupled to this machine's layout
  private val sfDir = sys.props.getOrElse("graft.testdata.dir",
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001"))

  // One pass over every entry checking two contracts at once:
  // (1) the driver's correctness comparator sorts result rows with
  // pandas and crashes on array/map/struct cells (CORRECTNESS_r01: 4
  // queries err'd with "unhashable type: 'numpy.ndarray'") — every
  // query must project nested types to scalars in its final SELECT;
  // (2) no physical plan may contain a CartesianProduct, and
  // BroadcastNestedLoopJoin is allowed only where a tiny broadcast side
  // makes it the right plan (ann_topk_bruteforce: 20 query vectors vs
  // the corpus — the documented exactness baseline; the scale path is
  // the bucketed ann_lsh_topk. ann_ivf_topk and v_kmeans_assign /
  // v_kmeans_lloyd3: the 16-row centroid table cross-scored against
  // the corpus — the broadcast side is the fixed cell count, never the
  // data).
  test("query outputs are scalar-only and plans are free of cartesian blowups") {
    val bnljAllowed = Set("ann_topk_bruteforce", "ann_ivf_topk",
      "v_kmeans_assign", "v_kmeans_lloyd3")
    val offenders = Registry.all.flatMap { e =>
      val df = e.fn(spark, sfDir)
      val nested = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => f.name
      }
      val plan = df.queryExecution.executedPlan.toString
      val planBad =
        (if (plan.contains("CartesianProduct")) Seq("CartesianProduct") else Nil) ++
        (if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(e.name))
          Seq("BroadcastNestedLoopJoin") else Nil)
      val bad = nested ++ planBad
      if (bad.isEmpty) None else Some(s"${e.name}: ${bad.mkString(",")}")
    }
    assert(offenders.isEmpty,
      s"driver-breaking schemas or cartesian plans: $offenders")
  }

  test("every query has a DuckDB oracle (or is explicitly exempt)") {
    val exempt = Set.empty[String] // rows-only checks allowed, but list them
    val missing = Registry.all.filter(e => e.oracle.isEmpty &&
      !exempt.contains(e.name)).map(_.name)
    assert(missing.isEmpty, s"queries without an oracle: $missing")
  }
}
