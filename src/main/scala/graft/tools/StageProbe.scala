package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.Packing
import graft.sources.Derived
/** TableIO.stage internals breakdown for the x18-shaped partitioned write. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SPROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    val tbl = docs.select(col("doc_id"), size(Derived.tokens(col("text"))).cast("long").as("toks"))
    val packed = Packing.tokenBudgetShards(tbl.filter(col("doc_id") >= 340), "doc_id", "toks", 512L).localCheckpoint(true)
    packed.count()
    val out = "/dev/shm/graft-probe-stage"
    for (rep <- 1 to 2) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      t(s"write_repart_$rep")(packed.repartition(32, col("shard")).write.mode("overwrite").partitionBy("shard").parquet(out))
      val w = t(s"read_construct_$rep")(spark.read.parquet(out))
      t(s"read_count_$rep")(w.count())
      t(s"lineage_$rep") {
        val m = classOf[graft.pipeline.TableIO.type]
        // call private lineage via reflection
        val meth = graft.pipeline.TableIO.getClass.getDeclaredMethods.find(_.getName.endsWith("lineage")).get
        meth.setAccessible(true)
        meth.invoke(graft.pipeline.TableIO, out)
      }
    }
    spark.stop()
  }
}
