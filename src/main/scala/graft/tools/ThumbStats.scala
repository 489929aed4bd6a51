package graft.tools

import graft.images.Images

/** Distortion profile for the d7 thumbnail-match design: for ids 0..n-1,
 *  build the catalog row (16×16, png/jpeg by parity) and its 8×8 thumbnail
 *  (same codec), then measure per-id
 *    - hamming between the catalog fingerprint ahash8(resize(decode(cat)))
 *      and the thumbnail fingerprint ahash8(decode(thumb)), and
 *    - the max abs per-channel deviation between those two 8×8 matrices
 *  — the data for choosing band geometry (recall bound) and the pixel
 *  refine tolerance. Also the cross-id fingerprint-collision count (the
 *  precision hazard the refine must kill). Pure JVM, no Spark. */
object ThumbStats {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500)
    val hist = new Array[Int](65)
    var maxDev = 0
    val fps = new Array[Long](n)
    (0 until n).foreach { i =>
      val id = i.toLong
      val fmt = if (id % 2 == 0) "png" else "jpeg"
      val catDec = Images.decode(Images.encode(Images.pixels(id), fmt))
      val catThumbPx = Images.resizePx(catDec, Images.W, Images.H, 8, 8)
      val thumbBytes = Images.encodeWH(
        Images.resizePx(Images.pixels(id), Images.W, Images.H, 8, 8), 8, 8, fmt)
      val thumbDec = Images.decode(thumbBytes)
      val catFp = Images.ahash8(catThumbPx)
      val thFp = Images.ahash8(thumbDec)
      fps(i) = catFp
      hist(java.lang.Long.bitCount(catFp ^ thFp)) += 1
      catThumbPx.zip(thumbDec).foreach { case (a, b) =>
        (0 to 2).foreach { c =>
          maxDev = math.max(maxDev,
            math.abs(((a >> (8 * c)) & 0xff) - ((b >> (8 * c)) & 0xff)))
        }
      }
    }
    println(hist.zipWithIndex.filter(_._1 > 0)
      .map { case (c, d) => s"$d:$c" }.mkString("same-id fp hamming hist: ", " ", ""))
    println(s"max abs channel deviation (thumb vs resized catalog): $maxDev")
    var coll = 0; var le3 = 0; var minCross = 64
    for (i <- 0 until n; j <- (i + 1) until n) {
      val h = java.lang.Long.bitCount(fps(i) ^ fps(j))
      if (h == 0) coll += 1
      if (h <= 3) le3 += 1
      minCross = math.min(minCross, h)
    }
    println(s"cross-id fingerprint collisions: ham0 $coll, ham<=3 $le3 of ${n.toLong * (n - 1) / 2} pairs; min cross hamming $minCross")
    // band-bucket hotness: 4 bands of 16 bits over the catalog fingerprints
    (0 until 4).foreach { b =>
      val sizes = fps.groupBy(f => (f >>> (b * 16)) & 0xffffL).values.map(_.length)
      val cand = sizes.map(s => s.toLong * s).sum
      println(s"band $b: ${sizes.size} buckets, max ${sizes.max}, sum sq (candidate scale) $cand")
    }
  }
}
