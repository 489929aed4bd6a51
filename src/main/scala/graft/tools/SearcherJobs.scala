package graft.tools

import org.apache.spark.sql.SparkSession

/** Print every Spark job (with callsite) fired by a warm distributed
 *  Searcher.correct() — diagnosing the per-query job budget. */
object SearcherJobs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Seq(
      (1L, "Jalan Sentosa Harapan", "Jalan Sentosa no 4"),
      (2L, "Dunia Fantasi", "Jalan Lodan Timur no 7"),
      (3L, "Kebun Binatang Ragunan", "Jalan Harsono no 1"),
      (4L, "Monumen Nasional", "Gambir Jakarta Pusat"),
      (5L, "Taman Mini Indonesia Indah", "Ceger Cipayung Jakarta Timur"),
      (6L, "Taman Suropati", "Menteng Jakarta Pusat")
    ).toDF("doc_id", "name", "address")
    val dist = new graft.query.Searcher(docs, "doc_id", "name", "address",
      spellErrorLines = Seq("dunia: duniu, dunai"), maxDriverVocab = 1L)
    println("WARMUP: " + dist.correct("Duniu Fsntaso"))
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val submitted = js.stageIds.toSet
        jobs.add(js.jobId + " nStages=" + js.stageInfos.size +
          " lastStage=" + js.stageInfos.maxBy(_.stageId).name +
          " details=" + js.stageInfos.maxBy(_.stageId).details.linesIterator
            .filter(_.contains("graft")).take(3).mkString(" <- "))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    println("SECOND: " + dist.correct("Kebun Bibatqng Raginan"))
    Thread.sleep(2000)
    spark.sparkContext.removeSparkListener(listener)
    jobs.forEach(j => println("JOB " + j))
    spark.stop()
  }
}
