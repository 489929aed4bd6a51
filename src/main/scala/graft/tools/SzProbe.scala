package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.Dedup
object SzProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 1000).select(col("doc_id"), col("text")).localCheckpoint(true)
    val sigs = Dedup.minhashSignatures(d, "doc_id", "text").localCheckpoint(true)
    val pairs = Dedup.minhashCandidates(sigs, None).localCheckpoint(true)
    val sh = Dedup.shingleTable(d, "doc_id", "text", 3)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz")).localCheckpoint(true)
    val szp = pairs.join(sizes.toDF("id1","sz1"), Seq("id1"))
      .join(sizes.toDF("id2","sz2"), Seq("id2"))
    val total = szp.count()
    val kept = szp.filter(least(col("sz1"),col("sz2")).cast("double")/greatest(col("sz1"),col("sz2")) >= 0.7).count()
    // exploded rows with/without the cut
    val rowsAll = szp.select(col("id1"),col("sz1")).agg(sum("sz1")).head().getLong(0)
    val rowsKept = szp.filter(least(col("sz1"),col("sz2")).cast("double")/greatest(col("sz1"),col("sz2")) >= 0.7)
      .agg(sum("sz1")).head().getLong(0)
    println(s"SZPROBE pairs=$total kept=$kept cut=${100.0*(total-kept)/total}%  explodedAll=$rowsAll explodedKept=$rowsKept")
    spark.stop()
  }
}
