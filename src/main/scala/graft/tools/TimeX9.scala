package graft.tools
import org.apache.spark.sql.SparkSession
/** Wall-clock probe for the composed curation query (x9) at a given SF. */
object TimeX9 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.entry.MlQueries.queries("x9_curation_e2e")(spark, dir).count()
      println(f"x9 run$i rows=$n wall=${(System.nanoTime()-t0)/1e9}%.1f s")
      graft.ml.Components.releaseResults()
    }
    spark.stop()
  }
}
