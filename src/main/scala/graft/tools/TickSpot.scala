package graft.tools

import org.apache.spark.sql.functions._

/** Spot-measure the streaming embedding-dedup tick's serving half at
  * corpus scale (SCALE.md §8 addendum, VERDICT r11 #6): build the
  * `_bands` LSH index for a corpus once, then time
  * `Similarity.embeddingCorpusFlags` for a new-vector batch against it
  * — the per-tick cost an ingest pipeline actually pays. The batch is
  * synthesized from the corpus itself: `dupFrac` of it are near-copies
  * of corpus vectors (must flag best_cosine ≥ minCosine), the rest
  * fresh Gaussian directions (must not) — so the run doubles as a
  * correctness check at scale, not just a stopwatch.
  *
  * Usage: runMain graft.tools.TickSpot <sfDir> <workDir> [batchN=1000]
  *        [bands=4] [rowsPerBand=11] [minCosine=0.9]
  * (rowsPerBand defaults to the occupancy-adaptive value the ×100
  * corpus gets from adaptiveRowsPerBand — the width a deployed index
  * at this scale would persist.)
  */
object TickSpot {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val work = args(1)
    def arg(i: Int, d: Int) = if (args.length > i) args(i).toInt else d
    val batchN = arg(2, 1000)
    val bands = arg(3, 4)
    val rpb = arg(4, 11)
    val minCos = if (args.length > 5) args(5).toDouble else 0.9
    val spark = ToolSession.local()
    import graft.core.Tables
    import graft.sim.Similarity

    val emb = Tables.embeddings(spark, sfDir)
    val dims = emb.select(size(col("embedding"))).head().getInt(0)
    val n = emb.count()

    val t0 = System.nanoTime()
    Similarity.lshBandRows(emb, "vec_id", "embedding", dims, bands, rpb)
      .write.mode("overwrite").parquet(s"$work/_bands")
    emb.write.mode("overwrite").parquet(s"$work/corpus")
    val tBuild = (System.nanoTime() - t0) / 1e9

    // batch: half near-copies of corpus vectors (shifted ids), half fresh
    val dup = emb.orderBy(col("vec_id")).limit(batchN / 2)
      .select((col("vec_id") + lit(900000000L)).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + (pmod(xxhash64(col("vec_id"), i, lit("tick")),
            lit(2001)) - 1000).cast("double") / 1e6).as("embedding"))
    val fresh = spark.range(batchN / 2)
      .select((col("id") + lit(950000000L)).as("vec_id"),
        transform(sequence(lit(0), lit(dims - 1)),
          i => ((pmod(xxhash64(col("id"), i, lit("fresh")), lit(2001)) - 1000)
            .cast("double") / 1000.0)).as("embedding"))
    val batch = dup.unionByName(fresh).localCheckpoint(true)

    val corpusVecs = spark.read.parquet(s"$work/corpus")
    val corpusBands = spark.read.parquet(s"$work/_bands")
    for (r <- 1 to 3) {
      val t1 = System.nanoTime()
      val flags = Similarity.embeddingCorpusFlags(corpusVecs, corpusBands,
        batch, "vec_id", "embedding", dims, bands, rpb)
      val dupFlagged = flags.filter(col("best_cosine") >= minCos).count()
      val tTick = (System.nanoTime() - t1) / 1e9
      println(f"[tickspot] corpus=$n batch=$batchN rep=$r: index build " +
        f"$tBuild%.1f s (one-off), flags pass $tTick%.1f s, " +
        f"$dupFlagged/${batchN / 2} planted dups flagged")
      require(dupFlagged >= batchN / 2 * 99 / 100,
        s"planted near-dups under-flagged: $dupFlagged of ${batchN / 2}")
    }
    spark.stop()
  }
}
