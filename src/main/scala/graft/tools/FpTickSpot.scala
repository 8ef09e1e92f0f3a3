package graft.tools

import org.apache.spark.sql.functions._

/** Spot-measure the streaming FINGERPRINT-dedup tick's serving half at
  * corpus scale (round 13 — the TickSpot sibling for the hamming
  * modalities): build a deterministic synthetic fingerprint corpus of
  * `n` 64-bit hashes plus its `_fpbands` index, then time
  * `NearDup.hammingCorpusFlags` for a 1000-fingerprint batch against
  * it. Half the batch are planted near-copies (≤2 bit flips of corpus
  * fingerprints — banding is pigeonhole-COMPLETE for them, so the run
  * requires 100% flagged, a correctness check at scale, not just a
  * stopwatch); half are fresh random hashes (a radius-2 ball holds
  * ~2k of 2⁶⁴ points, so accidental flags are negligible).
  *
  * The second knob this tool measures is the BAND-COUNT precision
  * dial the tick's scaladoc documents in place of a width guard:
  * hamming banding splits a FIXED 64-bit hash, so occupancy cannot be
  * chased by widening — but the band count can trade completeness
  * radius for collision rate (bands=8 → 8-bit bands, 256 buckets,
  * complete to ham 7; bands=4 → 16-bit bands, 65k buckets, complete
  * to ham 3 — plenty for a ≤2 dup test, with ~256× fewer random band
  * collisions). Candidates ∝ batch·n/2^(64/bands): at 20M hashes the
  * bands=8 shape scans ~625M candidate rows and bands=4 ~1.2M — the
  * dial is the difference between a tick and a batch job.
  *
  * Usage: runMain graft.tools.FpTickSpot <workDir> [n=200000]
  *        [batchN=1000] [bands=8] [maxHamming=2]
  * bands=0 (r14, VERDICT r13 #1) = the ADAPTIVE dial: the corpus index
  * is built at `hammingAutoBands(n)` — exactly what
  * `ensureFpBandIndexFresh` serves a tick at that corpus size — so the
  * measured row shows the tick cost at the count the guard would pick.
  */
object FpTickSpot {
  def main(args: Array[String]): Unit = {
    val work = args(0)
    def arg(i: Int, d: Long) = if (args.length > i) args(i).toLong else d
    val n = arg(1, 200000L)
    val batchN = arg(2, 1000L)
    val maxHam = arg(4, 2L).toInt
    val bandsArg = arg(3, 8L).toInt
    val bands =
      if (bandsArg == 0)
        graft.text.NearDup.hammingAutoBands(n, 64, 8, maxHam)
      else bandsArg
    if (bandsArg == 0)
      println(s"[fptickspot] adaptive dial: n=$n -> bands=$bands")
    val spark = ToolSession.local()
    import graft.text.NearDup

    // deterministic corpus: fp(id) = xxhash64(id, "fp")
    val corpus = spark.range(n)
      .select(col("id").as("doc_id"), xxhash64(col("id"), lit("fp")).as("fp"))
    val t0 = System.nanoTime()
    corpus.write.mode("overwrite").parquet(s"$work/corpus")
    NearDup.hammingBandRows(spark.read.parquet(s"$work/corpus"),
        "doc_id", "fp", bits = 64, bands = bands)
      .write.mode("overwrite").parquet(s"$work/_fpbands")
    val tBuild = (System.nanoTime() - t0) / 1e9

    // batch: half planted near-copies (flip ≤2 derived bit positions),
    // half fresh hashes
    val half = batchN / 2
    val dup = spark.range(half)
      .selectExpr("id + 900000000L AS doc_id",
        // same fp as corpus id, with two derived bit positions flipped
        // (SQL <<, not functions.shiftleft — the latter wants a literal
        // shift count)
        """xxhash64(id, 'fp')
           ^ (1L << int(pmod(xxhash64(id, 'p1'), 64)))
           ^ (1L << int(pmod(xxhash64(id, 'p2'), 64))) AS fp""")
    val fresh = spark.range(half)
      .select((col("id") + lit(950000000L)).as("doc_id"),
        xxhash64(col("id"), lit("fresh")).as("fp"))
    val batch = dup.unionByName(fresh).localCheckpoint(true)

    val idx = spark.read.parquet(s"$work/_fpbands")
    for (r <- 1 to 3) {
      val t1 = System.nanoTime()
      val flags = NearDup.hammingCorpusFlags(idx, batch, "doc_id", "fp",
        bits = 64, bands = bands)
      val flagged = flags.filter(col("best_hamming") <= maxHam).count()
      val tTick = (System.nanoTime() - t1) / 1e9
      println(f"[fptickspot] corpus=$n batch=$batchN bands=$bands rep=$r: " +
        f"index build $tBuild%.1f s (one-off), flags pass $tTick%.1f s, " +
        f"$flagged/$half planted near-dups flagged")
      // two flips can land on the same position (hamming 1) or cancel
      // (hamming 0) — both still ≤ maxHam, so completeness demands ALL
      require(flagged >= half,
        s"planted near-dups under-flagged: $flagged of $half")
    }
    spark.stop()
  }
}
