package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash / SimHash sketches for near-duplicate detection at scale.
  *
  * Design (standard shingle→minhash→band→bucket-join pipeline): hash
  * each distinct shingle with [[TextFunctions.tokenHash]], apply k
  * universal-hash permutations h_i(x) = (a_i·x + b_i) mod P, keep the
  * min per permutation; group the k values into bands and bucket-join
  * on (band index, band value) so candidate generation is an equi-join
  * — never an O(n²) cross product. All math is 64-bit integer, so the
  * DuckDB oracle reproduces it bit-exactly.
  */
object SketchFunctions {

  /** Mersenne prime 2^31−1; a_i·x stays < 2^63 for x < 2^32. */
  val P = 2147483647L

  /** Deterministic universal-hash coefficients (primes), k = 8. */
  val minhashCoeffs: Seq[(Long, Long)] = Seq(
    (1299721L, 104729L), (15485863L, 32452843L),
    (49979687L, 67867967L), (86028121L, 23456789L),
    (2750159L, 7368787L), (9576889L, 14348907L),
    (104395301L, 15487469L), (179424673L, 982451653L))

  val numBands = 4 // bands of rows=2 over the k=8 signature

  /** h_i applied to an already-hashed shingle value. */
  def permute(h: Column, i: Int): Column = {
    val (a, b) = minhashCoeffs(i)
    (lit(a) * h + lit(b)) % lit(P)
  }

  // -- count-min sketch (frequency estimation) ------------------------
  //
  // The frequency member of the sketch family (KMV = cardinality,
  // MinHash/LSH = similarity): d=4 universal-hash rows × w=1024
  // buckets of counters. The (row, bucket)-keyed count table IS the
  // sketch — counter matrices merge by addition, which is exactly what
  // map-side partial aggregation and streaming aggregation state do to
  // counts, so the engine maintains the sketch with no custom state
  // code. Point estimate = min over rows of the probed bucket count;
  // always an OVERestimate (collisions only add), within 2N/w with
  // probability 1 − 2^−d. All integer arithmetic on the shared
  // [[graft.functions.TextFunctions.tokenHash]] values — the DuckDB
  // oracle rebuilds the identical matrix.

  val cmsDepth = 4
  val cmsWidth = 1024L

  /** The d (row, bucket) coordinates of an already-hashed value, as an
    * array ready to explode (bucket_i = h_i(th) mod w). */
  def cmsCoords(th: Column): Column =
    array((0 until cmsDepth).map { i =>
      struct(lit(i).as("r"), (permute(th, i) % lit(cmsWidth)).as("b"))
    }: _*)

  /** DuckDB VALUES relation of the d hash-row coefficients, for the
    * oracle's cross-join form: `CROSS JOIN ${cmsCoeffSql} AS c(r, a, b)`
    * with bucket `(c.a * th + c.b) % $P % $cmsWidth`. */
  def cmsCoeffSql: String =
    minhashCoeffs.take(cmsDepth).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }
      .mkString("(VALUES ", ", ", ")")

  // -- bloom filter (membership) --------------------------------------
  //
  // The membership member of the sketch family: k=4 universal-hash bit
  // positions in an m=65,536-bit array. The SET-BIT SET is the filter
  // (built as a distinct-positions relation — at 100 TB the 8 KB bit
  // array broadcasts and the probe is scan-local); no false negatives
  // ever, false positives at rate ≈ (1 − e^(−kn/m))^k. Same hash
  // coefficients and 32-bit [[TextFunctions.tokenHash]] input as the
  // CMS rows, so a*x stays < 2^63 and the DuckDB oracle rebuilds the
  // identical positions.

  val bloomK = 4
  val bloomM = 65536L

  /** The k bit positions of an already-32-bit-hashed value, ready to
    * explode. */
  def bloomPositions(th: Column): Column =
    array((0 until bloomK).map(i => permute(th, i) % lit(bloomM)): _*)

  /** DuckDB VALUES relation of the k position-hash coefficients. */
  def bloomCoeffSql: String =
    minhashCoeffs.take(bloomK).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }
      .mkString("(VALUES ", ", ", ")")

  /** doc-id + exploded distinct shingle hashes → one row per doc with
    * minhash columns h0..h{k-1}. Input must have columns (id, sh)
    * where sh is the raw shingle string. One shuffle (the groupBy). */
  def minhashSignature(exploded: DataFrame, idCol: String): DataFrame = {
    val h = TextFunctions.tokenHash(col("sh"))
    val aggs = minhashCoeffs.indices.map(i => min(permute(h, i)).as(s"h$i"))
    exploded.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** The k minhash columns computed scan-locally from ONE row's
    * already-hashed shingle array (`ths`: array<bigint>) — the
    * streaming-ingest form of [[minhashSignature]]: a document arrives
    * whole, so its signature needs no explode + groupBy (which on a
    * stream would be a stateful aggregation); same coefficients, same
    * values. Pass a MATERIALIZED attribute for `ths` (see
    * TextFunctions.shingles3FromTokens perf note). */
  def rowSignature(ths: Column): Seq[Column] =
    minhashCoeffs.indices.map(i =>
      array_min(transform(ths, t => permute(t, i))).as(s"h$i"))

  /** Band columns b0..b{numBands-1} derived from a signature row:
    * each band is the pair (h_{2j}, h_{2j+1}) packed into a string. */
  def withBands(sig: DataFrame): DataFrame =
    (0 until numBands).foldLeft(sig) { (df, j) =>
      df.withColumn(s"b$j",
        concat_ws("_", col(s"h${2 * j}"), col(s"h${2 * j + 1}")))
    }

  /** 32-bit SimHash over a multiset of token hashes: bit j of the
    * result is set iff the sum over tokens of ±1 (by bit j of the token
    * hash) is positive. Input: (id, th) exploded rows, th = token hash.
    * One shuffle. */
  def simhash32(exploded: DataFrame, idCol: String): DataFrame = {
    val sums = (0 until 32).map { j =>
      sum(when(expr(s"(shiftright(th, $j) & 1) = 1"), 1).otherwise(-1))
        .as(s"s$j")
    }
    val packed = (0 until 32)
      .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    exploded.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
      .select(col(idCol), packed.as("simhash32"))
  }
}
