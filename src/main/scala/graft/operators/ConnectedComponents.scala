package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the step a
  * dedup pipeline needs between "near-dup pairs" and "keep one doc per
  * duplicate group": pairs are edges, each component is a duplicate cluster,
  * and min(doc_id) is the canonical representative.
  *
  * Scale shape: each iteration is one equi-join + one map-side-combinable
  * min-aggregate on the node id — no driver-side graph, no cartesian.
  * Iterations needed = component diameter (dedup clusters are shallow;
  * maxIter bounds pathological chains). Lineage is truncated with an eager
  * `localCheckpoint` per iteration so plan depth stays O(1) instead of
  * O(iterations) (on a cluster, prefer `checkpoint` with a reliable dir).
  * The convergence check piggybacks on the same pass (one action per
  * iteration).
  */
object ConnectedComponents {

  /** `edges`: two-column DataFrame (src, dst), undirected. Returns
    * (node, component) where component = min node id reachable.
    *
    * Throws if `maxIter` is exhausted before convergence (component
    * diameter > maxIter): returning unconverged labels would silently split
    * duplicate clusters. Raise `maxIter` for long-chain graphs — dedup
    * clusters are star-shaped and converge in 1-2 iterations. */
  def run(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val e = edges.toDF("src", "dst")
    // Materialize the edge set once — it is re-joined every iteration, and
    // without this the upstream pipeline (e.g. the whole MinHash candidate
    // generation) would re-execute per iteration.
    // Both orientations come from ONE explode over one upstream execution
    // (r22): `e.union(e.select(dst, src))` planned the upstream pipeline
    // TWICE — each union branch re-ran the whole candidate+verify
    // computation per call (measured as duplicated ~300/400 ms stage pairs
    // in llm_dedup_clusters). explode_outer, not explode: the 2-element
    // array is provably non-empty, and plain explode would re-inline the
    // struct array into a pushed-down emptiness guard.
    val sym = e.select(explode_outer(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst")).distinct()
      .localCheckpoint(true)
    // Initial label = min(node, min(neighbor)) — the first propagation step
    // fused into initialization (one aggregate instead of a join pass).
    // Star-shaped graphs (dedup clusters) converge HERE; the loop's first
    // iteration is then just the no-change certificate. NOT checkpointed
    // (r21): its lineage is one aggregate over the already-checkpointed
    // edge blocks, so iteration 1 re-derives it cheaply where it is used
    // instead of paying a dedicated materialization job; from iteration 1
    // on, `labels` is the loop's own checkpoint, keeping plan depth O(1).
    var labels = sym.groupBy(col("src"))
      .agg(min(col("dst")).as("nbl"))
      .select(col("src").as("node"),
        least(col("src"), col("nbl")).as("component"))
    // Superseded checkpoints are unpersisted EXPLICITLY (r21): checkpoint
    // blocks are only reclaimed when the ContextCleaner notices the RDD is
    // unreachable, which on a driver that keeps allocating (a bench loop, a
    // long-running dedup service) lags far behind — measured as
    // monotonically growing per-call times (1.8 s → 3.2 s over 5 calls)
    // from block-manager/GC pressure. Freed only AFTER the replacement is
    // materialized; the final labels frame is never unpersisted (its
    // truncated lineage cannot be recomputed).
    var retired: Option[DataFrame] = None
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // candidate = min label among neighbours; node keeps min(own, candidate)
      val nbr = sym
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"))
        .agg(min("component").as("nbl"))
      val next = labels
        .join(nbr, Seq("node"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nbl"), col("component")))
            .as("component"),
          (col("nbl") < col("component")).as("improved"))
      // The improved-count rides the checkpoint's materialization pass as
      // an Observation — the convergence certificate costs zero extra
      // actions; on an init-converged star graph the whole loop is this
      // ONE join pass.
      val obs = new org.apache.spark.sql.Observation()
      val stepped = next
        .observe(obs, count(when(col("improved"), 1)).as("changed"))
        .localCheckpoint(true)
      changed = obs.get.apply("changed").asInstanceOf[Long]
      // stepped is materialized — the previous iteration's checkpoint (an
      // intermediate, never returned) can release its blocks now.
      retired.foreach(_.unpersist())
      retired = Some(stepped)
      labels = stepped.drop("improved")
      iter += 1
    }
    // The edge checkpoint is dead once the loop converges; the returned
    // frame references only the last iteration's blocks.
    sym.unpersist()
    if (changed > 0)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter iterations " +
          s"($changed labels still improving) — raise maxIter")
    labels
  }
}
