package graft.tools

import org.apache.spark.sql.functions._

/** Measure BPE merge-budget scaling (VERDICT r16 #2): the recount
  * trainer's per-round cost is word-table-bounded (Heaps-bounded rows,
  * SCALE.md §12), so the open question at realistic vocabularies is
  * ROUND-COUNT overhead — 256 or 1024 sequential rounds of
  * (pair-count aggregate + argmax collect + kernel projection + lazy
  * checkpoint) are 256–1024 small jobs whose scheduling + checkpoint
  * bookkeeping could dominate the arithmetic. For each budget this
  * prints: merges actually trained (the corpus may dry up under
  * minCount — that is data, not an error, and is WHY the registered
  * oracle face stays at 12), total train wall, s/round, and the
  * end-to-end tokenizePackLoose wall (training + the batched kernel
  * segmentation chain + packing) with its output row count.
  *
  * Usage: runMain graft.tools.BpeTrainSpot <sfDir> [budgets=64,256,1024]
  *        [minCount=2] [packBudget=256]
  */
object BpeTrainSpot {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val budgets = (if (args.length > 1) args(1) else "64,256,1024")
      .split(",").map(_.trim.toInt).toSeq
    val minCount = if (args.length > 2) args(2).toLong else 2L
    val packBudget = if (args.length > 3) args(3).toInt else 256
    val spark = ToolSession.local()
    val docs = graft.core.Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    for (b <- budgets) {
      val t0 = System.nanoTime()
      val (merges, _) = graft.text.Bpe.trainBpe(docs, "text", b, minCount)
      val trained = merges.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[bpetrain] corpus=$nDocs budget=$b: trained $trained " +
        f"merges in $wall%.1f s (${wall / math.max(trained, 1)}%.3f s/round)")
    }
    // end-to-end: train + segment (kernel chain, checkpoint-batched) +
    // positions + ids + pack, at the loose face's contract
    val t1 = System.nanoTime()
    val packed = graft.text.Bpe.tokenizePackLoose(docs, "doc_id", "text",
      "lang", numMerges = packBudget, blockTokens = 256)
    val rows = packed.count()
    println(f"[bpetrain] tokenizePackLoose budget=$packBudget: $rows " +
      f"subword rows in ${(System.nanoTime() - t1) / 1e9}%.1f s end-to-end")
    spark.stop()
  }
}
