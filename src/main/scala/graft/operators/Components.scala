package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a near-duplicate pair list —
  * the step that turns pairwise dedup candidates (MinHash / SimHash /
  * embedding pairs) into DELETION GROUPS: keep min-id per component,
  * drop the rest. The reference's dedup surface stops at pairs; a
  * 100 TB curation pipeline needs the grouping to act on them.
  *
  * Algorithm: iterative min-label propagation — every node repeatedly
  * takes the minimum label among itself and its neighbors, as
  * map-side-combinable joins + min-aggregations, until a fixpoint
  * (checked with one count per round). Rounds = graph diameter, which
  * for near-dup clusters is small (they are dense quasi-cliques);
  * for adversarially deep graphs the alternating large-star/small-star
  * variant (Kiveris et al., "Connected Components in MapReduce and
  * Beyond") halves diameter per round — same join/agg shape, so this
  * operator is the template. Deterministic: min() is order-free, and
  * the fixpoint is unique regardless of execution order.
  */
object Components {

  /** edges = undirected pair list (two numeric id columns). Returns
    * (id, component) for every node APPEARING IN AN EDGE, component =
    * min id of the node's component. Isolated nodes don't appear (a
    * dedup consumer treats absence as "keep"). */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val e = edges.toDF("a", "b").where(col("a").isNotNull && col("b").isNotNull)
    // localCheckpoint (not persist): each round's plan must reference
    // MATERIALIZED rows, not the previous round's logical plan — with
    // lazy lineage the accumulated join/agg tree grows per round and
    // Catalyst re-optimizes all of it every iteration (observed OOM at
    // ~2 800 edges). Checkpointing keeps every round's plan flat.
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint()
    var lbl = sym.select(col("a").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // each node's candidate labels: its own + every neighbor's
      val viaNeighbor = sym.join(lbl, sym("b") === lbl("id"))
        .select(sym("a").as("id"), col("lbl"))
      val next = lbl.union(viaNeighbor)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint()
      changed = next.join(lbl.select(col("id"), col("lbl").as("prev")), "id")
        .where(col("lbl") =!= col("prev")).count()
      lbl = next
      iter += 1
    }
    lbl.select(col("id"), col("lbl").as("component"))
  }

  /** Dedup grouping over the engine's SimHash near-dup pairs: every
    * doc in a near-dup component mapped to its keeper (min doc_id). */
  def simhashClusters(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    connectedComponents(
      graft.SparkEntry.queries("dedup_simhash_pairs")(spark, dir)
        .select(col("doc_a"), col("doc_b")))
}
