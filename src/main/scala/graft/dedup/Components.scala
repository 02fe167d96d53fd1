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
    */
  def connectedComponents(nodes: DataFrame, idCol: String, edges: DataFrame,
      maxIters: Int = 20): DataFrame = {
    val sym = edges
      .select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
      .unionByName(edges
        .select(col("id_b").cast("long").as("src"), col("id_a").cast("long").as("dst")))
      .localCheckpoint() // the LSH/verify lineage above is re-read every round otherwise
    var labels = nodes.select(col(idCol).cast("long").as("id"))
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("lbl").as("dst_lbl")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_lbl")).as("nbr_lbl"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      changed = next
        .join(labels.select(col("id"), col("lbl").as("prev")), Seq("id"))
        .filter(col("lbl") < col("prev")).count()
      labels = next
      it += 1
    }
    labels.select(col("id").as(idCol), col("lbl").as("cluster_id"))
  }
}
