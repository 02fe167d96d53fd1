package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-dup candidate edge list — the clustering
  * stage between pair scoring and survivor selection: documents transitively
  * similar form ONE duplicate group, so "keep best per group" sees the whole
  * family, not just direct pairs.
  *
  * Algorithm: iterative min-label propagation to a fixpoint — each round,
  * every node's label becomes the min label in its closed neighborhood;
  * stop when no label changes. Scale shape: one shuffle of the (bounded)
  * edge list per round; the round count is the component diameter, and
  * near-dup graphs are unions of small dense cliques (diameter 2-3), so a
  * handful of rounds converge even at corpus scale. For pathological chains
  * the alternating large-star/small-star scheme (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14) gets O(log log n) rounds —
  * plain propagation is the right trade for clique-shaped dup graphs.
  * `localCheckpoint` between rounds cuts the exponentially growing lineage.
  */
object Components {

  /** (idCol, cluster_id) for every node: cluster_id = the min id reachable
    * through `edges` (singletons keep their own id). `edges` are undirected
    * (id_a, id_b) pairs.
    *
    * Scale shape: the iteration runs ONLY over nodes incident to an edge —
    * in a near-dup graph that subgraph is orders of magnitude smaller than
    * the corpus (duplicate density, not corpus size, bounds it). Singletons
    * — the overwhelming majority at 100 TB — never enter the loop; they are
    * labeled with their own id in one final broadcast-sized left join.
    */
  def connectedComponents(nodes: DataFrame, idCol: String, edges: DataFrame,
      maxIters: Int = 20): DataFrame = {
    // Edges are restricted to endpoints that EXIST in `nodes` before any
    // label is seeded: a stray endpoint (edge id absent from the node set —
    // a stale candidate pair, a filtered-out document) must neither bridge
    // two otherwise-separate clusters nor become a cluster_id that matches
    // no node row. Cost: one id-projected semi-join per direction; the node
    // side is a column-pruned scan, the edge side is the (small) candidate
    // list.
    val nodeIds = nodes.select(col(idCol).cast("long").as("id")).distinct()
    val raw = edges
      .select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
      .unionByName(edges
        .select(col("id_b").cast("long").as("src"), col("id_a").cast("long").as("dst")))
    val sym = raw
      .join(nodeIds.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(nodeIds.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .localCheckpoint() // the LSH/verify lineage above is re-read every round otherwise
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("lbl").as("dst_lbl")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_lbl")).as("nbr_lbl"))
      // one materialized join serves BOTH the convergence test and the next
      // labels (a projection over it) — no second change-detection join
      val joined = labels.join(nbrMin, Seq("id"))
        .localCheckpoint()
      changed = joined.filter(col("nbr_lbl") < col("lbl")).count()
      labels = joined.select(col("id"), least(col("lbl"), col("nbr_lbl")).as("lbl"))
      it += 1
    }
    // singletons (no incident edge) keep their own id; the label table is
    // duplicate-subgraph-sized — small enough that AQE broadcasts it (no
    // explicit hint: a pathological all-duplicate corpus should still shuffle)
    nodes.select(col(idCol).cast("long").as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("lbl"), col("id")).as("cluster_id"))
  }
}
