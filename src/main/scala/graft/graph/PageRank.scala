package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an UNDIRECTED pair graph (Page/Brin
  * 1998, public), in pure integer micro-units so two engines agree
  * bit-for-bit — the repo's answer to "which duplicate is canonical":
  * run PageRank over the near-dup pair graph and the highest-rank member
  * of each cluster is the most-connected (hence most representative)
  * copy, a centrality-based refinement of dedupClusters' min-id pick.
  *
  * Numerics: classic PageRank aggregates floating-point contributions,
  * whose sum order varies with partitioning — unreproducible across
  * engines AND across runs. Here rank is a micro-unit long (1.0 ≡
  * 1_000_000), each neighbor contribution is the integer division
  * `rank_micro div degree`, and damping is `(sum · 85) div 100` —
  * every step exact integer arithmetic, order-independent by
  * construction, identically renderable in DuckDB (`//`). The div
  * truncation loses < 1 micro-unit per edge per iteration — noise three
  * orders of magnitude below the 0.15 damping floor, and the SAME noise
  * in both engines.
  *
  * Update rule (rank-sum-N convention, per node):
  *   r⁰ = 1_000_000
  *   rᵏ⁺¹ = 150_000 + (Σ_{(u→v)∈E} (rᵏ(u) div deg(u)) · 85) div 100
  *
  * Scale: per iteration, one join of the node-sized rank frame against
  * the edge list on `src` and one aggregation on `dst` — the standard
  * message-passing shape. Iterations are FIXED (an analytics knob, not a
  * convergence loop), so the lineage is `iters` joins deep: fine at the
  * single digits used for canonical-pick; a 50-iteration production run
  * would checkpoint every ~10 like dedupClusters does (NearDup scaladoc
  * documents the cluster-mode `checkpoint(dir)` requirement).
  */
object PageRank {

  /** Ranks after `iters` iterations over the symmetrized `edges`
    * (srcCol, dstCol) — pairs are treated as undirected and must not
    * repeat. Emits (node, rank_micro, rank).
    *
    * `checkpointEvery` (r12, closing the scaladoc's own note): a
    * production run past ~20 iterations must truncate the rank frame's
    * lineage periodically — each iteration embeds the previous one's
    * join+agg, so an uncheckpointed 50-round plan is 50 joins deep
    * (analysis/codegen time grows superlinearly and the lineage
    * re-executes on any recompute). Every `checkpointEvery` rounds the
    * rank frame is eagerly localCheckpoint'ed (node-sized — the cheap
    * thing to materialize; the edge frame is already checkpointed
    * once). 0 keeps the plain unrolled form and the 20-iteration
    * budget; results are bit-identical either way (integer update rule
    * — PageRankSpec pins parity), so checkpointing is purely a plan
    * decision. On a cluster needing fault tolerance, substitute
    * checkpoint(dir) — the dedupClusters doctrine.
    */
  def pageRankMicro(edges: DataFrame, srcCol: String, dstCol: String,
                    iters: Int, checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 1 && (iters <= 20 || checkpointEvery >= 1),
      s"iters=$iters: fixed-iteration analytics expects 1..20 " +
        "(set checkpointEvery >= 1 to unroll beyond)")
    require(checkpointEvery >= 0, s"checkpointEvery=$checkpointEvery")
    // Eager localCheckpoint, the dedupClusters doctrine: deg, nodes, and
    // every iteration's contrib join all reference the edge frame, so
    // without truncation the edge-PRODUCING pipeline (an LSH candidate
    // generator, typically) is re-embedded per reference — measured 93
    // exchanges in the 3-iteration static plan, vs ~15 after. The blocks
    // back the returned frame's lineage, so they are NOT released here;
    // the ContextCleaner reclaims them once the caller drops the result.
    // On a cluster needing fault tolerance, substitute checkpoint(dir).
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .localCheckpoint(true)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("node")).distinct()
    var ranks = nodes.withColumn("rank_micro", lit(1000000L))
    for (i <- 1 to iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"), expr("rank_micro div deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("(coalesce(s, 0L) * 85) div 100")).as("rank_micro"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint(true)
    }
    ranks.select(col("node"), col("rank_micro"),
      (col("rank_micro").cast("double") / lit(1e6)).as("rank"))
  }
}
