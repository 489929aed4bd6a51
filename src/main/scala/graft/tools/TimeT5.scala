package graft.tools
import org.apache.spark.sql.SparkSession
/** Wall-clock probe for the composed text queries at a given SF. */
object TimeT5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    for (q <- Seq("a7_bm25f", "t5_search_e2e", "t5_search_e2e", "t6_autocomplete", "t6_autocomplete", "t7_freeform", "t7_freeform")) {
      val t0 = System.nanoTime()
      val n = graft.entry.TextQueries.queries(q)(spark, dir).count()
      println(f"$q rows=$n wall=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
