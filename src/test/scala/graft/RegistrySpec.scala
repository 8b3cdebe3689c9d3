package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

import graft.queries.Registry

/** Contract checks on the driver-facing query registry. */
class RegistrySpec extends SparkTestBase {

  // overridable so the suite is not coupled to this machine's layout
  private val sfDir = sys.props.getOrElse("graft.testdata.dir",
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001"))

  // The driver's correctness comparator sorts result rows with pandas
  // and crashes on array/map/struct cells (CORRECTNESS_r01: 4 queries
  // err'd with "unhashable type: 'numpy.ndarray'"). Every query must
  // therefore project nested types to scalars in its final SELECT.
  test("no query output schema contains nested (driver-unsortable) columns") {
    val offenders = Registry.all.flatMap { e =>
      val nested = e.fn(spark, sfDir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => f.name
      }
      if (nested.isEmpty) None else Some(s"${e.name}: ${nested.mkString(",")}")
    }
    assert(offenders.isEmpty,
      s"nested output columns crash the driver comparator: $offenders")
  }

  test("every query has a DuckDB oracle (or is explicitly exempt)") {
    val exempt = Set.empty[String] // rows-only checks allowed, but list them
    val missing = Registry.all.filter(e => e.oracle.isEmpty &&
      !exempt.contains(e.name)).map(_.name)
    assert(missing.isEmpty, s"queries without an oracle: $missing")
  }
}
