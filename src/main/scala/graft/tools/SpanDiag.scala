package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.Dedup

/** Where do d8b/d9/x11's seconds go at sf0.1? Staged timings: the span
 *  explode alone, the decontaminate branch, the survivor checkpoint, and
 *  spanRemove's cut/rebuild halves — each fully materialized (toRdd.count,
 *  so Catalyst cannot prune the expensive branches). */
object SpanDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.entry.MlQueries.{DecontamK, DecontamMod, SpanK}

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SPANDIAG $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def mat(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      t("tokens only") { mat(d.select(explode(graft.sources.Derived.tokens(col("text"))))) }
      t("spanTable") { mat(Dedup.spanTable(d, "doc_id", "text", SpanK)) }
      t("span window (count+key)") {
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("span"))
        mat(Dedup.spanTable(d, "doc_id", "text", SpanK)
          .withColumn("n_occ", count(lit(1)).over(w))
          .withColumn("keep_key", min(col("doc_id") * 1048576L + col("pos")).over(w)))
      }
      t("d9 decontaminate") {
        mat(Dedup.decontaminate(d.filter(col("doc_id") % DecontamMod =!= 0),
          d.filter(col("doc_id") % DecontamMod === 0), "doc_id", "text", DecontamK))
      }
      val surv = t("x11 survivors ckpt") {
        val train = d.filter(col("doc_id") % DecontamMod =!= 0)
        val bench = d.filter(col("doc_id") % DecontamMod === 0)
        val cleanIds = Dedup.decontaminate(train, bench, "doc_id", "text", DecontamK)
          .filter(!col("contaminated")).select(col("doc_id"))
        train.join(cleanIds, Seq("doc_id"), "left_semi").localCheckpoint(eager = true)
      }
      t("spanRemove (full)") { mat(Dedup.spanRemove(surv, "doc_id", "text", SpanK)) }
      t("d8b on raw docs (full)") { mat(Dedup.spanRemove(d, "doc_id", "text", SpanK)) }
    }
    spark.stop()
  }
}
