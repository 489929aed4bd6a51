package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.entry.SpatialQueries
import graft.query.Spatial
import graft.sources.Derived

/**
 * Benchmark main (driver contract): one JSON line on stdout.
 *
 * Two measurements:
 *  1. every `SparkEntry.queries` entry timed once at local[32]
 *     ("queries": {name: sec}) — the correctness surface's cost profile;
 *  2. the north-rule metric (BASELINE.json): "spatial-join + kNN
 *     tile-assignment throughput (rows/s) … with >=0.8 throughput scaling
 *     efficiency from N to 4N executors" — the composite job (tile
 *     assignment → per-tile counts → PIP polygon join → batch kNN join) is
 *     run at local[N] and local[4N] on the same materialized input (per
 *     driver instructions: two parallelism levels stand in for two cluster
 *     sizes), each after an untimed JIT warm-up, median of `reps` timed
 *     runs. Efficiency = (rows/s at 4N) / (4 × rows/s at N).
 */
object Bench {

  /**
   * Deterministic scaled-up objects table: each orders key is replicated
   * `r` times and re-derived through the same lat/lon arithmetic as
   * [[Derived.objects]], so the north job is COMPUTE-bound rather than
   * scheduler-bound (at 15k rows the job is pure fixed overhead and any
   * scaling measurement is noise). No `cell` column — tile assignment is
   * part of the TIMED job, not the input.
   */
  def scaledObjects(spark: SparkSession, sfDir: String, targetRows: Long): DataFrame = {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet").select(col("o_orderkey"))
    val n = orders.count()
    val r = math.max(1L, targetRows / math.max(1L, n))
    val key = (col("o_orderkey") * r + col("rep")).as("key")
    orders.crossJoin(spark.range(r).toDF("rep"))
      .select(key)
      .select(
        col("key").as("id"),
        Derived.latExpr(col("key")).as("lat"),
        Derived.lonExpr(col("key")).as("lon"),
        concat(lit("f"), (col("key") % 7).cast("string")).as("feature"))
  }

  /**
   * Materialize the bench input once as a 128-file parquet table (setup,
   * untimed, shared by both parallelism levels). The test parquet ships as
   * ONE row group — a single input split — which would serialize the whole
   * map side and make any scaling number meaningless; a real 10^12-row
   * table has millions of splits, so the bench input must be split too.
   */
  def materializeInput(sfDir: String, targetRows: Long): String = {
    val path = s"/tmp/graft-bench-input-${targetRows}-${sfDir.replaceAll("[^a-zA-Z0-9.]", "_")}"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS"))) {
      val spark = session(8)
      try scaledObjects(spark, sfDir, targetRows).repartition(128)
        .write.mode("overwrite").parquet(path)
      finally spark.stop()
    }
    path
  }

  /** The north-metric composite job over the materialized input table:
   *  cell/tile assignment -> per-tile counts -> PIP polygon join -> batch
   *  kNN join. Returns input rows processed. */
  def northJob(spark: SparkSession, inputPath: String): Long = {
    val objs = spark.read.parquet(inputPath)
      .withColumn("cell", graft.functions.GeoFunctions.cellEncode(
        col("lat"), col("lon"), graft.core.Cells.DefaultLevel))
    // tile assignment forced over every row + per-tile counts; the sum IS
    // the row count (no separate scan)
    val total = objs.groupBy("cell").agg(count(lit(1)).as("n"))
      .agg(sum("n")).head().getLong(0)
    val qMod = math.max(1L, total / 1024)
    // spatial join: broadcast cell-prefilter + exact PIP refine
    Spatial.pipJoin(objs, SpatialQueries.Polygons.all).count()
    // batch kNN join of a ~1k deterministic query sample
    val queries = objs.filter(pmod(col("id"), lit(qMod)) === 0)
      .select(col("id").as("qid"), (col("lat") + 0.01).as("qlat"),
        (col("lon") - 0.01).as("qlon"))
    Spatial.knnJoin(objs, queries, k = 5).count()
    total
  }

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // the bounded top-k udaf keeps ~1k groups per map task; the default
      // ObjectHashAggregate fallback threshold (128 groups) would silently
      // degrade it to sort-based agg over every candidate row
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // the bench input is 128 files; without this a default 128MB split
      // would swallow several files and starve the map side. 16MB splits
      // give hundreds of map tasks at either parallelism level
      .config("spark.sql.files.maxPartitionBytes", (16L * 1024 * 1024).toString)
      // shuffle files on tmpfs: the VM's ext4 adds heavy kernel time
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /**
   * rows/s of [[northJob]] at `cpus` threads: one untimed warm-up, then
   * `reps` timed runs; the MEDIAN is the reported throughput. This sandbox
   * is a shared-host VM with bursty CPU steal (observed up to 14% st / 40%
   * sy in vmstat), so single-shot timings vary up to 3x; the median of
   * repeated identical runs is the stable estimator. All raw runs are
   * reported alongside.
   */
  private def northThroughput(cpus: Int, inputPath: String, reps: Int): (Long, Double, Seq[Double]) = {
    val spark = session(cpus)
    try {
      northJob(spark, inputPath) // warm-up (JIT + codegen + listing), untimed
      var rows = 0L
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        rows = northJob(spark, inputPath)
        (System.nanoTime() - t0) / 1e9
      }
      val median = secs.sorted.apply(reps / 2)
      (rows, rows / median, secs)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // 1. per-query timings at full parallelism
    val spark32 = session(32)
    val queryTimes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark32, sfDir).count(); true } catch { case _: Throwable => false }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec else -1.0)
    }
    spark32.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // 2. north metric at two parallelism levels. N=4, 4N=16: with 32 vCPUs
    // on a shared host, runs at 32 threads collide with hypervisor-level
    // contention (CPU steal) and measure the neighbours, not the engine.
    val targetRows = sys.env.getOrElse("SPARK_GRAFT_NORTH_ROWS", "256000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val (n, n4) = (4, 16)
    val inputPath = materializeInput(sfDir, targetRows)
    val (rowsN, thrN, secsN) = northThroughput(n, inputPath, reps)
    val (_, thrN4, secsN4) = northThroughput(n4, inputPath, reps)
    val efficiency = thrN4 / (4.0 * thrN)

    val qs = queryTimes.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val totalSec = queryTimes.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"spatial-join + kNN tile-assignment throughput (rows/s)","value":$thrN4,"unit":"rows/s","queries":$qs,"sf":"$sfDir","total_query_sec":$totalSec,"north_rows":$rowsN,"scaling":{"n_cpus":$n,"n4_cpus":$n4,"n_rows_per_s":$thrN,"n4_rows_per_s":$thrN4,"efficiency":$efficiency,"n_secs":[${secsN.mkString(",")}],"n4_secs":[${secsN4.mkString(",")}]}}""")
  }
}
