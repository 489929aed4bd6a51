package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions
import graft.core.Cells

/**
 * Deterministic derivations from the driver-generated parquet tables
 * (TESTDATA.md). Every derivation here is pure integer/double arithmetic so
 * the DuckDB oracle can compute the *identical* values via the SQL twins —
 * the Spark expression and SQL string are kept side by side and must stay in
 * lock-step.
 *
 * The spatial "objects" table plays the role of the reference's OSM object
 * set (/root/reference/pkg/datastructure/rtree.go:598-606): id, lat, lon,
 * and a feature tag. Positions land in a bounded region over Java island,
 * Indonesia, matching the reference's test coordinate ranges
 * (rtree_test.go:222-257).
 */
object Derived {

  /** Quantize a double to 1e-4 as int64 — the hash-stable way both engines
   *  agree on floating-point outputs. */
  def q4(c: Column): Column = round(c * 10000).cast("long")
  def q4Sql(e: String): String = s"CAST(round(($e) * 10000) AS BIGINT)"

  /** Quantize to 1e-6 (for log-probs / scores needing more precision kept). */
  def q6(c: Column): Column = round(c * 1000000).cast("long")
  def q6Sql(e: String): String = s"CAST(round(($e) * 1000000) AS BIGINT)"

  // ---- spatial objects from orders ----------------------------------------

  val LatBase = -8.5; val LatSpan = 3.0
  val LonBase = 106.0; val LonSpan = 5.0

  def latExpr(key: Column): Column =
    lit(LatBase) + lit(LatSpan) * ((key * 9973L + 12345L) % 100000L).cast("double") / 100000.0
  def lonExpr(key: Column): Column =
    lit(LonBase) + lit(LonSpan) * ((key * 7919L + 54321L) % 100000L).cast("double") / 100000.0

  def latSql(key: String): String =
    s"($LatBase + $LatSpan * ((($key) * 9973 + 12345) % 100000) / 100000.0)"
  def lonSql(key: String): String =
    s"($LonBase + $LonSpan * ((($key) * 7919 + 54321) % 100000) / 100000.0)"

  /** Spark side: objects (id, lat, lon, feature, cell) derived from orders. */
  def objects(spark: SparkSession, sfDir: String, level: Int = Cells.DefaultLevel): DataFrame =
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(
        col("o_orderkey").as("id"),
        latExpr(col("o_orderkey")).as("lat"),
        lonExpr(col("o_orderkey")).as("lon"),
        concat(lit("f"), (col("o_orderkey") % 7).cast("string")).as("feature"))
      .withColumn("cell", GeoFunctions.cellEncode(col("lat"), col("lon"), level))

  /** DuckDB twin of [[objects]] (no cell column — the oracle never needs it;
   *  tile assignment is verified through the grid-index query instead). */
  val objectsSqlCte: String =
    s"""objects AS (
       |  SELECT o_orderkey AS id,
       |         ${latSql("o_orderkey")} AS lat,
       |         ${lonSql("o_orderkey")} AS lon,
       |         'f' || CAST(o_orderkey % 7 AS VARCHAR) AS feature
       |  FROM orders
       |)""".stripMargin

  // ---- way polylines from orders (for nearest-street / reverse geocode) ---

  /** Every WayMod-th orders key becomes a 4-vertex way polyline: vertex i is
   *  the base point displaced i steps along a key-derived direction. Plays
   *  the role of the reference's street/way boundary node lists
   *  (indexer.go:986-1026, searcher.go:438-460). */
  val WayMod = 17L
  val WayVerts = 4

  def wayDLatExpr(key: Column): Column =
    (((key * 131L) % 7L) - 3L).cast("double") / 1000.0
  def wayDLonExpr(key: Column): Column =
    (((key * 173L) % 9L) - 4L).cast("double") / 1000.0
  def wayDLatSql(key: String): String = s"(((($key) * 131) % 7) - 3) / 1000.0"
  def wayDLonSql(key: String): String = s"(((($key) * 173) % 9) - 4) / 1000.0"

  /** Spark side: ways (way_id, wlats, wlons) with WayVerts vertices each. */
  def ways(spark: SparkSession, sfDir: String): DataFrame = {
    val key = col("o_orderkey")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(key % WayMod === 0)
      .select(
        key.as("way_id"),
        array((0 until WayVerts).map(i =>
          latExpr(key) + lit(i.toDouble) * wayDLatExpr(key)): _*).as("wlats"),
        array((0 until WayVerts).map(i =>
          lonExpr(key) + lit(i.toDouble) * wayDLonExpr(key)): _*).as("wlons"))
  }

  /** DuckDB twin of [[ways]]: scalar base + direction columns (the oracle
   *  derives vertex i as blat + i*dlat). */
  val waysSqlCte: String =
    s"""ways AS (
       |  SELECT o_orderkey AS way_id,
       |         ${latSql("o_orderkey")} AS blat,
       |         ${lonSql("o_orderkey")} AS blon,
       |         ${wayDLatSql("o_orderkey")} AS dlat,
       |         ${wayDLonSql("o_orderkey")} AS dlon
       |  FROM orders WHERE o_orderkey % $WayMod = 0
       |)""".stripMargin

  // ---- named bbox objects from orders (for spatial dedup, P4) -------------

  /** Objects with a name and a bounding box, for the same-name containment
   *  dedup (reference indexer.go:582-618). Groups of 3 consecutive keys
   *  share a center + name (base = id - id%3) with key-varied extents, so
   *  nested same-name bboxes — the duplicate shape the reference hunts —
   *  actually occur. */
  def namedBoxes(spark: SparkSession, sfDir: String): DataFrame = {
    val id = col("o_orderkey")
    val base = id - (id % 3)
    val eLat = (((id * 37L) % 40L) + 1L).cast("double") / 2000.0
    val eLon = (((id * 53L) % 40L) + 1L).cast("double") / 1500.0
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(
        id.as("id"),
        concat(lit("n"), (base % 97L).cast("string")).as("name"),
        (latExpr(base) - eLat).as("lat_min"), (latExpr(base) + eLat).as("lat_max"),
        (lonExpr(base) - eLon).as("lon_min"), (lonExpr(base) + eLon).as("lon_max"))
  }

  val namedBoxesSqlCte: String = {
    val base = "(o_orderkey - (o_orderkey % 3))"
    val eLat = "(((o_orderkey * 37) % 40) + 1) / 2000.0"
    val eLon = "(((o_orderkey * 53) % 40) + 1) / 1500.0"
    s"""named_boxes AS (
       |  SELECT o_orderkey AS id,
       |         'n' || CAST($base % 97 AS VARCHAR) AS name,
       |         ${latSql(base)} - $eLat AS lat_min,
       |         ${latSql(base)} + $eLat AS lat_max,
       |         ${lonSql(base)} - $eLon AS lon_min,
       |         ${lonSql(base)} + $eLon AS lon_max
       |  FROM orders
       |)""".stripMargin
  }

  // ---- trajectory points from events (for geofencing) ---------------------

  /** Per-user trajectory: event stream with a deterministic position per
   *  event. user_id is the query-point id (reference fence_index.go:50-85). */
  def track(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")
      .select(
        col("event_id"), col("user_id"), col("ts"),
        latExpr(col("event_id") * 7L + col("user_id")).as("lat"),
        lonExpr(col("event_id") * 7L + col("user_id")).as("lon"))

  val trackSqlCte: String =
    s"""track AS (
       |  SELECT event_id, user_id, ts,
       |         ${latSql("event_id * 7 + user_id")} AS lat,
       |         ${lonSql("event_id * 7 + user_id")} AS lon
       |  FROM events
       |)""".stripMargin

  // ---- text tokenization ---------------------------------------------------

  /** Pinned tokenizer spec (SURVEY.md F1): lowercase, strip non-[a-z0-9] to
   *  spaces, split on whitespace, drop empties. Used identically on index
   *  and query paths. */
  def tokens(c: Column): Column =
    filter(split(regexp_replace(lower(c), "[^a-z0-9]+", " "), " "), t => t =!= "")

  def tokensSql(e: String): String =
    s"list_filter(string_split(regexp_replace(lower($e), '[^a-z0-9]+', ' ', 'g'), ' '), t -> t <> '')"

  /** Exploded (doc_id, pos, term) over documents.text — DuckDB twin below. */
  def docTerms(spark: SparkSession, sfDir: String): DataFrame = {
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "term")))
  }

  val docTermsSqlCte: String =
    s"""doc_terms AS (
       |  SELECT doc_id,
       |         unnest(range(len(${tokensSql("text")}))) AS pos,
       |         unnest(${tokensSql("text")}) AS term
       |  FROM documents
       |)""".stripMargin
}
