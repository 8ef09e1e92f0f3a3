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

    // STALE-DEMO (r14, VERDICT r13 #1): when the corpus index above was
    // built at a band count the corpus size no longer wants (bands=8 at
    // 20M), time the guard's detect+re-band pass and the subsequent
    // fresh no-op re-check — the §8-addendum-5 measurement, fingerprint
    // edition. Seed the meta at the BUILT count so the guard sees a
    // genuine frozen artifact.
    val bandsEff = if (sys.env.contains("SPARK_GRAFT_FPSTALE_DEMO")) {
      graft.sim.IndexMeta.write(spark, s"$work/_fpbands_meta",
        Seq("bits" -> 64L, "max_hamming" -> maxHam.toLong,
          "bands" -> bands.toLong, "built_n" -> n))
      val corpusDf = spark.read.parquet(s"$work/corpus")
      val t1 = System.nanoTime()
      val b1 = NearDup.ensureFpBandIndexFresh(corpusDf, "doc_id", "fp",
        bits = 64, s"$work/_fpbands", s"$work/_fpbands_meta",
        floorBands = bands, maxHamming = maxHam)
      val tRebuild = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val b2 = NearDup.ensureFpBandIndexFresh(corpusDf, "doc_id", "fp",
        bits = 64, s"$work/_fpbands", s"$work/_fpbands_meta",
        floorBands = bands, maxHamming = maxHam)
      val tFresh = (System.nanoTime() - t2) / 1e9
      println(f"[fptickspot] staleDemo: built bands=$bands, corpus $n -> " +
        f"detect+re-band to $b1 in $tRebuild%.1f s; fresh re-check " +
        f"(stays $b2) $tFresh%.1f s")
      // the flags loop below serves at the dial the guard landed on —
      // an index and a batch banded differently never collide
      b1
    } else bands
    val idx = spark.read.parquet(s"$work/_fpbands")
    for (r <- 1 to 3) {
      val t1 = System.nanoTime()
      val flags = NearDup.hammingCorpusFlags(idx, batch, "doc_id", "fp",
        bits = 64, bands = bandsEff)
      val flagged = flags.filter(col("best_hamming") <= maxHam).count()
      val tTick = (System.nanoTime() - t1) / 1e9
      println(f"[fptickspot] corpus=$n batch=$batchN bands=$bandsEff rep=$r: " +
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
