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
   *
   * Throws IllegalStateException if labels are still changing after
   * `maxIters` rounds (unconverged labels would silently mislabel). The
   * returned DataFrame is backed by ONE persisted RDD; call
   * [[releaseResults]] once results are materialized to free it (all other
   * intermediate persistence is released before returning).
   */
  def minLabel(nodes: DataFrame, edges: DataFrame, maxIters: Int = 256): DataFrame = {
    val spark = nodes.sparkSession

    def persisted(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
      val rdd = df.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rdd.count()
      (spark.createDataFrame(rdd, df.schema), rdd)
    }
    // ids/sym were localCheckpoint(eager) before, but localCheckpoint's
    // internal RDD exposes no handle to unpersist — materialize through the
    // same RDD boundary so the loop inputs can be released after the loop
    val (ids, idsRdd) = persisted(nodes.select(col("id")))
    val (sym, symRdd) = persisted(edges.select(col("id1"), col("id2"))
      .unionByName(edges.select(col("id2").as("id1"), col("id1").as("id2"))))

    var roundRdds = List.empty[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
    def materializeRound(df: DataFrame): DataFrame = {
      val (out, rdd) = persisted(df)
      roundRdds = rdd :: roundRdds
      out
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
    // loop inputs are no longer needed; rounds were already pruned to the
    // final one, which BACKS the returned DataFrame and stays persisted
    idsRdd.unpersist(blocking = false)
    symRdd.unpersist(blocking = false)
    // silently returning unconverged labels would mislabel components; a
    // graph whose diameter outruns maxIters rounds must fail loudly (the
    // upgrade path for such graphs is large-star/small-star, see scaladoc)
    if (changedCount > 0) {
      roundRdds.foreach(_.unpersist(blocking = false))
      throw new IllegalStateException(
        s"connected components did not converge after $maxIters rounds " +
          s"($changedCount labels still changing) — raise maxIters or use a " +
          "star-contraction algorithm for high-diameter graphs")
    }
    roundRdds.foreach { r => finalRdds.add(r); () }
    labels.select(col("id"), col("label").as("comp"))
  }

  // Ownership of the one persisted RDD that backs each returned labels
  // DataFrame: unpersisting it before the caller consumes the result would
  // force a full re-iteration, so the library keeps a registry and lets the
  // caller (or a session-level sweep, e.g. between bench queries) release
  // them once results are materialized.
  private val finalRdds =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row], java.lang.Boolean]())

  /** Unpersist every label RDD still held from completed [[minLabel]] calls.
   *  Safe to call once their results have been written/collected; a later
   *  action on a stale result recomputes instead of erroring. */
  def releaseResults(): Unit = {
    val it = finalRdds.iterator()
    while (it.hasNext) { it.next().unpersist(blocking = false); it.remove() }
  }
}
