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
  *        [bands=4] [rowsPerBand=11] [minCosine=0.9] [staleDemo=0]
  * (rowsPerBand defaults to the occupancy-adaptive value the ×100
  * corpus gets from adaptiveRowsPerBand — the width a deployed index
  * at this scale would persist.)
  *
  * staleDemo=1 (VERDICT r12 #2/#3 evidence): after the normal build,
  * DOWNGRADE the index to a deliberately narrow width-5 build (the
  * registered small-scale width — what a deployment that never
  * re-checked would still be running), then time
  * `Similarity.ensureBandIndexFresh` detecting the stale width and
  * rebuilding at the corpus's adaptive width — the rebuild cost a
  * tick pays ONCE per width step, vs saturating occupancy forever.
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

    val staleDemo = args.length > 6 && args(6).toInt == 1

    val t0 = System.nanoTime()
    Similarity.lshBandRows(emb, "vec_id", "embedding", dims, bands, rpb)
      .write.mode("overwrite").parquet(s"$work/_bands")
    Similarity.writeBandIndexMeta(spark, s"$work/_bands_meta", bands, rpb, n)
    emb.write.mode("overwrite").parquet(s"$work/corpus")
    val tBuild = (System.nanoTime() - t0) / 1e9

    val rpbEff = if (staleDemo) {
      // downgrade to the registered small-scale width, then time the
      // guard detecting staleness and rebuilding at the adaptive width
      val narrow = 5
      Similarity.lshBandRows(emb, "vec_id", "embedding", dims, bands, narrow)
        .write.mode("overwrite").parquet(s"$work/_bands")
      Similarity.writeBandIndexMeta(spark, s"$work/_bands_meta", bands, narrow, n)
      val corpus = spark.read.parquet(s"$work/corpus")
      val t2 = System.nanoTime()
      val rEff = Similarity.ensureBandIndexFresh(corpus, "vec_id", "embedding",
        dims, s"$work/_bands", s"$work/_bands_meta", bands,
        floorRowsPerBand = narrow)
      val tRebuild = (System.nanoTime() - t2) / 1e9
      val meta = Similarity.readBandIndexMeta(spark, s"$work/_bands_meta")
      println(f"[tickspot] staleDemo: width-$narrow index over corpus=$n " +
        f"detected stale, rebuilt at width $rEff in $tRebuild%.1f s " +
        s"(meta now $meta)")
      require(rEff == Similarity.adaptiveRowsPerBand(n, narrow),
        s"rebuild width $rEff != adaptive width")
      // a second check must be a cheap no-op (fresh index)
      val t3 = System.nanoTime()
      val again = Similarity.ensureBandIndexFresh(corpus, "vec_id", "embedding",
        dims, s"$work/_bands", s"$work/_bands_meta", bands,
        floorRowsPerBand = narrow)
      println(f"[tickspot] staleDemo: fresh re-check ${(System.nanoTime() - t3) / 1e9}%.1f s (width $again)")
      require(again == rEff, "fresh re-check must keep the rebuilt width")
      // the flags loop below serves at the width the guard landed on —
      // an index and a batch banded at different widths never collide
      // (the FpTickSpot lesson; at ×100 rpb happened to equal the
      // adaptive width and hid this)
      rEff
    } else rpb

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
        batch, "vec_id", "embedding", dims, bands, rpbEff)
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
