package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components over an arbitrary undirected edge list by min-label
 * propagation with pointer jumping — the shared engine behind raster
 * vectorization (4-neighbor grid graphs, [[graft.query.Raster.vectorize]])
 * and near-duplicate clustering (LSH/minhash candidate-pair graphs,
 * [[Dedup.dupClusters]]).
 *
 * Each round takes the min over neighbor labels, then compresses
 * label -> label-of-label (labels are always member ids, so the self-join
 * is well-defined). Jumping compresses chains quickly, but worst-case
 * rounds are still bounded by the component diameter (the min must be
 * DISCOVERED by neighbor hops before pointers can shortcut to it), hence
 * the generous maxIters; each round is a single cheap shuffle over the
 * node set. For planetary-diameter components the upgrade path is the
 * large-star/small-star algorithm (Kiveris et al.), same DataFrame ops.
 *
 * Materialization note — every iterative-DataFrame pitfall at once:
 *  - localCheckpoint flattens the plan but COPIES the parent's sizeInBytes
 *    statistic, so the two joins per round compound it — the BigInt doubles
 *    in bit-length each round and by round ~20 the driver spends minutes in
 *    BigInteger.multiply (measured: 250 s for round 23).
 *  - persist() keeps real stats but keeps the whole child PLAN — the tree
 *    deepens every round and AQE burns the driver in generateTreeString
 *    for listener events.
 * materializeRound crosses the RDD boundary instead: a flat LogicalRDD
 * (constant-size plan) with constant default stats, persisted so the next
 * round reads memory, lineage truncated each round.
 */
object Components {

  /**
   * nodes: one long column `id` (every node, including isolated ones);
   * edges: (id1, id2), either orientation, symmetrized internally.
   * Output: (id, comp) where comp = the component's minimum node id.
   */
  def minLabel(nodes: DataFrame, edges: DataFrame, maxIters: Int = 256): DataFrame = {
    val spark = nodes.sparkSession
    val ids = nodes.select(col("id")).localCheckpoint(eager = true)
    val sym = edges.select(col("id1"), col("id2"))
      .unionByName(edges.select(col("id2").as("id1"), col("id1").as("id2")))
      .localCheckpoint(eager = true)

    var roundRdds = List.empty[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
    def materializeRound(df: DataFrame): DataFrame = {
      val rdd = df.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rdd.count()
      roundRdds = rdd :: roundRdds
      spark.createDataFrame(rdd, df.schema)
    }
    var labels = materializeRound(ids.select(col("id"), col("id").as("label")))
    var changedCount = 1L
    var iter = 0
    val debug = spark.conf.getOption("spark.graft.components.debug").contains("true")
    while (changedCount > 0 && iter < maxIters) {
      val t0 = System.nanoTime()
      val viaNeighbor = sym
        .join(labels.withColumnRenamed("id", "id2").withColumnRenamed("label", "nlabel"), Seq("id2"))
        .groupBy(col("id1").as("id")).agg(min(col("nlabel")).as("nmin"))
      // neighbor-min step; pointer jump joins a DISTINCTLY-named copy (a
      // same-name self-join resolves ambiguously — both "label" attributes
      // share lineage); the changed flag rides along in the same plan
      val stepped = materializeRound(
        labels.join(viaNeighbor, Seq("id"), "left_outer")
          .select(col("id"), col("label").as("old"),
            least(col("label"), coalesce(col("nmin"), col("label"))).as("label")))
      val parents = stepped.select(col("id").as("pid"), col("label").as("plabel"))
      val next = materializeRound(
        stepped.join(parents, col("label") === col("pid"), "left_outer")
          .select(col("id"),
            least(col("label"), coalesce(col("plabel"), col("label"))).as("label"),
            (least(col("label"), coalesce(col("plabel"), col("label"))) =!= col("old")).as("changed")))
      changedCount = next.filter(col("changed")).count()
      labels = next.select(col("id"), col("label"))
      // free everything except the RDD labels now depends on
      val keep = roundRdds.head
      roundRdds.tail.foreach(_.unpersist(blocking = false))
      roundRdds = List(keep)
      iter += 1
      if (debug)
        println(f"components iter=$iter changed=$changedCount wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    labels.select(col("id"), col("label").as("comp"))
  }
}
