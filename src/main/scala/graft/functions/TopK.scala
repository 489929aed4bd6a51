package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/**
 * Bounded per-group top-k aggregate: keeps the k smallest (dist, id) pairs,
 * ordered by (dist, id). The buffer is capped at k elements, so the partial
 * (map-side) aggregation shrinks each group's shuffle contribution from
 * every candidate row to at most k rows per map task — the distributed
 * equivalent of the reference R-tree's incremental-NN early termination
 * (/root/reference/pkg/datastructure/rtree.go:685-723), and the difference
 * between shuffling ~k rows and shuffling every point of the query's cell
 * disk at dense tiles.
 *
 * A window row_number() computes the same result but shuffles ALL candidate
 * rows to the query's reducer first; at 10^12 rows that is the bottleneck.
 *
 * Usage: `df.groupBy("qid").agg(TopK.topKByDist(k)($"dist", $"id"))` →
 * `array<struct<_1:double,_2:bigint>>`, sorted ascending by (dist, id).
 */
object TopK {

  type DistId = (Double, Long)

  @inline private def lt(a: DistId, b: DistId): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  private class TopKAgg(k: Int) extends Aggregator[DistId, Seq[DistId], Seq[DistId]] {
    override def zero: Seq[DistId] = Vector.empty
    override def reduce(buf: Seq[DistId], v: DistId): Seq[DistId] =
      if (buf.length >= k && lt(buf.last, v)) buf          // v worse than kth
      else ((buf :+ v).sortWith(lt)).take(k)
    override def merge(a: Seq[DistId], b: Seq[DistId]): Seq[DistId] =
      (a ++ b).sortWith(lt).take(k)
    override def finish(buf: Seq[DistId]): Seq[DistId] = buf
    override def bufferEncoder: Encoder[Seq[DistId]] = ExpressionEncoder[Seq[DistId]]()
    override def outputEncoder: Encoder[Seq[DistId]] = ExpressionEncoder[Seq[DistId]]()
  }

  /** k-nearest aggregate over struct(_1 = dist double, _2 = id long). */
  def topKByDist(k: Int): UserDefinedFunction = udaf(new TopKAgg(k))
}
