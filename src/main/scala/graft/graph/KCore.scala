package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-CORE PEELING (Seidman 1983's cores, computed by the standard
  * iterative-peel: repeatedly delete nodes of degree < k) — the
  * community-density filter next to triangles (q114) and PageRank
  * (q77): the k-core is the maximal subgraph where every node keeps ≥ k
  * neighbors INSIDE the subgraph, the usual definition of a cohesive
  * group that survives the removal of hangers-on. (Reference scope
  * note: the reference engine has no graph surface; post-parity pack.)
  *
  * Termination is data-dependent (peeling cascades), so the operator
  * takes an explicit `rounds` budget and unrolls exactly that many
  * peels — the q77 PageRank discipline: a FIXED iteration count keeps
  * the computation oracle-mirrorable (the oracle unrolls the same
  * stages) and the job graph statically bounded; callers needing the
  * fixpoint re-invoke with a larger budget and compare survivor counts
  * (equal counts ⇒ converged, since peeling is monotone). Each round
  * is one degree aggregation + two semi joins, all on the shrinking
  * edge frame; eager checkpoints truncate the per-round lineage so
  * round r+1 does not re-execute rounds 1..r (the PageRank lesson).
  */
object KCore {

  /** Peel `rounds` times at threshold `k` over undirected canonical
    * edges (srcCol < dstCol, no repeats); returns (node, deg) for nodes
    * with ≥ 1 surviving edge, degrees measured in the surviving
    * subgraph.
    */
  def peel(edges: DataFrame, srcCol: String, dstCol: String,
           k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    var e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    // FIXPOINT EARLY EXIT (r19): peeling is monotone — a round that
    // drops no edge leaves every later round an identity pass, so the
    // remaining budget can be skipped with a bit-identical result (the
    // scaladoc's own "equal survivor counts ⇒ converged" argument,
    // applied per round). The check is one count() per round over the
    // just-materialized checkpoint blocks — a scalar job, against a
    // saved round of degree agg + two semi joins + checkpoint each.
    var prevEdges = e.count()
    var r = 0
    var converged = prevEdges == 0L
    while (r < rounds && !converged) {
      val deg = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("node"))
        .localCheckpoint(true)
      e = e
        .join(keep.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .localCheckpoint(true)
      val nEdges = e.count()
      converged = nEdges == prevEdges || nEdges == 0L
      prevEdges = nEdges
      r += 1
    }
    e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
  }
}
