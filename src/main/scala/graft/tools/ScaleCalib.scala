package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pure-CPU scaling calibration: how close to 4x does THIS box get from
 *  local[8] to local[32] on an embarrassingly parallel job? Diagnostic. */
object ScaleCalib {
  def main(args: Array[String]): Unit = {
    for (cpus <- Seq(8, 32)) {
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      def job(): Long = {
        val n = 512L * 1000 * 1000
        spark.range(0, n, 1, cpus * 4)
          .select(sum(pow(sin(col("id").cast("double")), 2)).as("s"))
          .head(); n
      }
      job() // warm
      val t0 = System.nanoTime(); val n = job()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CALIB cpus=$cpus%2d  $sec%6.2f s  ${n / sec / 1e6}%8.1f Mrows/s")
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }
}
