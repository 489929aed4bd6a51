package graft.tools

import org.apache.spark.sql.SparkSession

import graft.images.Images

/** Deviation profile of the JPEG half of the image table: decoded-vs-
 *  expected per-pixel max dev, channel-mean dev (×10⁴), aHash hamming,
 *  and the same for the 8×8 resized chain — the data for choosing the
 *  f18/f19 oracle bounds. Also dumps sample JPEG bytes for the
 *  independent Python decoder. */
object JpegStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = Images.imageTable(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("fmt") === "jpeg")
      .select("image_id", "bytes").collect()
    println(s"jpeg rows: ${rows.length}")
    var maxPix = 0; var maxMean = 0L; var maxHam = 0; var maxRes = 0
    var minPsnr = Double.MaxValue
    rows.foreach { r =>
      val id = r.getString(0).stripPrefix("img_").toLong
      val bytes = r.getAs[Array[Byte]]("bytes")
      val dec = Images.decode(bytes)
      val exp = Images.pixels(id)
      minPsnr = math.min(minPsnr, Images.psnrDb(exp, dec))
      var i = 0
      while (i < dec.length) {
        var c = 0
        while (c < 3) {
          maxPix = math.max(maxPix,
            math.abs(((dec(i) >> (8 * c)) & 0xff) - ((exp(i) >> (8 * c)) & 0xff)))
          c += 1
        }
        i += 1
      }
      def means(px: Array[Int]): Seq[Long] = Seq(16, 8, 0).map(s =>
        px.map(p => ((p >> s) & 0xff).toLong).sum * 10000 / px.length)
      maxMean = math.max(maxMean,
        means(dec).zip(means(exp)).map { case (a, b) => math.abs(a - b) }.max)
      maxHam = math.max(maxHam,
        java.lang.Long.bitCount(Images.phash(dec) ^ Images.phash(exp)))
      val resDec = Images.resizePx(dec, 16, 16, 8, 8)
      val resExp = Images.resizePx(exp, 16, 16, 8, 8)
      var j = 0
      while (j < resDec.length) {
        var c = 0
        while (c < 3) {
          maxRes = math.max(maxRes,
            math.abs(((resDec(j) >> (8 * c)) & 0xff) - ((resExp(j) >> (8 * c)) & 0xff)))
          c += 1
        }
        j += 1
      }
    }
    println(f"minPsnr=$minPsnr%.2f maxPixelDev=$maxPix maxMeanDev4=$maxMean maxAhashHamming=$maxHam maxResizedDev=$maxRes")
    // dump a few samples for the Python twin decoder
    rows.take(5).foreach { r =>
      val p = java.nio.file.Paths.get(s"/tmp/${r.getString(0)}.jpg")
      java.nio.file.Files.write(p, r.getAs[Array[Byte]]("bytes"))
      println(s"wrote $p")
    }
    spark.stop()
  }
}
