package graft

import org.apache.spark.sql.SparkSession

/**
 * Extra benchmark main (guide §1: measure first, §1.4 noop-sink isolation).
 * Bench.scala is FROZEN for measurement, so all optimization-round probes
 * live here. Mirrors Bench's session() config exactly so numbers are
 * comparable with the driver's query phase.
 *
 * Usage: runMain graft.BenchExtra [--reps N] [--plans DIR] [--noop] \
 *          [--sf SFDIR] [query ...]
 *  - with no query names: all SparkEntry queries, alphabetical
 *  - --plans DIR: write each query's .explain("formatted") to DIR/<q>.txt
 *  - --noop: time a noop-sink write (computes every column) instead of the
 *    bench's count() action — isolates the computation from action pruning
 * Timing methodology matches Bench: warm-up queries first, each query timed
 * `reps` times, min and all raw reps reported.
 */
object BenchExtra {

  private def localDir: String = sys.env.get("SPARK_GRAFT_LOCAL_DIR").getOrElse {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isWritable(shm)) "/dev/shm/graft-spark"
    else System.getProperty("java.io.tmpdir") + "/graft-spark"
  }

  def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-extra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (64L * 1024 * 1024).toString)
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    var reps = 2
    var plansDir: Option[String] = None
    var noop = false
    var sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case "--plans" => plansDir = Some(args(i + 1)); i += 2
        case "--noop" => noop = true; i += 1
        case "--sf" => sfDir = args(i + 1); i += 2
        case q => names += q; i += 1
      }
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = session(cpus)
    val queries =
      if (names.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else names.toSeq.map(n => n -> SparkEntry.queries(n))
    // same warm-up discipline as Bench
    Seq("q1_agg", "x3_token_counts").foreach(q =>
      SparkEntry.queries.get(q).foreach(fn =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }))
    val results = queries.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      plansDir.foreach { dir =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"$name.txt"),
          plan.getBytes("UTF-8"))
      }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try {
          if (noop) fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          else fn(spark, sfDir).count()
        } catch { case e: Throwable =>
          println(s"ERROR $name: ${e.getClass.getSimpleName} ${e.getMessage}")
          return
        }
        val t = (System.nanoTime() - t0) / 1e9
        graft.ml.Components.releaseResults()
        t
      }
      println(f"BENCHX $name%-24s min=${times.min}%7.3f  reps=${times.map(t => f"$t%.3f").mkString(",")}")
      name -> times.min
    }
    println(f"BENCHX TOTAL(min) ${results.map(_._2).sum}%.2f s over ${results.size} queries")
    spark.stop()
  }
}
