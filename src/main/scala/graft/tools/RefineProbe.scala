package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.Dedup

/** A/B timing of the jaccardRefine formulations on the d11-shaped input
 *  (optimization-round diagnostics). Usage: runMain graft.tools.RefineProbe */
object RefineProbe {
  // the pre-optimization exploded-row formulation, verbatim
  def refineOld(docs: DataFrame, idCol: String, textCol: String,
                n: Int, threshold: Double, pairs: DataFrame): DataFrame = {
    val sh = Dedup.shingleTable(docs, idCol, textCol, n)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    pairs.select(col("id1"), col("id2"))
      .join(sh.toDF("id1", "shingle"), Seq("id1"))
      .join(sh.toDF("id2", "shingle"), Seq("id2", "shingle"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("id1", "sz1"), Seq("id1"))
      .join(sizes.toDF("id2", "sz2"), Seq("id2"))
      .filter(col("inter").cast("double") /
        (col("sz1") + col("sz2") - col("inter")) >= threshold)
      .select(col("id1"), col("id2"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"RPROBE $label%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 1000)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val sigs = Dedup.minhashSignatures(d, "doc_id", "text").localCheckpoint(true)
    val pairs = Dedup.minhashCandidates(sigs, None).localCheckpoint(true)
    println(s"pairs=${pairs.count()}")
    for (rep <- 1 to 3) {
      t(s"old_rep$rep")(refineOld(d, "doc_id", "text", 3, 0.7, pairs).count())
      t(s"new_rep$rep")(Dedup.jaccardRefine(d, "doc_id", "text", 3, 0.7, pairs).count())
    }
    // parity: identical pair sets
    val o = refineOld(d, "doc_id", "text", 3, 0.7, pairs)
    val nw = Dedup.jaccardRefine(d, "doc_id", "text", 3, 0.7, pairs)
    println(s"old_rows=${o.count()} new_rows=${nw.count()} " +
      s"diff=${o.exceptAll(nw).count() + nw.exceptAll(o).count()}")
    nw.explain("formatted")
    spark.stop()
  }
}
