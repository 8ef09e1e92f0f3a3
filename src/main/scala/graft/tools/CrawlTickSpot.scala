package graft.tools

import org.apache.spark.sql.functions._

/** Spot-measure the streaming crawl-ingest tick (VERDICT r16 #6) at
  * corpus scale — the per-tick cost of keeping the HTML→boilerplate
  * stage incremental: each wave stages a disjoint slice of the corpus
  * as raw HTML (the q222 fixture wrapping), one
  * [[graft.streaming.StreamingIngest.crawlIngestTick]] drains it
  * (extract once, append the line grain, fold the df grid), and the
  * read face ([[graft.text.TextOps.lineFilteredCorpus]]) materializes
  * the filtered corpus WITHOUT re-parsing any HTML. The final row
  * times the one-shot q224 recompute over the same corpus — the cost a
  * per-run pipeline pays every run and the tick architecture pays
  * never.
  *
  * Curated mode (VERDICT r17 #2) runs the FULL incremental capstone
  * instead: [[graft.streaming.StreamingIngest.curatedCrawlTick]] per
  * wave (line/df fold + delta-maintained per-doc attrs/signatures),
  * read face = [[graft.pipeline.CrawlCurate.fromStores]] (the whole
  * q226 tail over stored narrow columns), one-shot = the q226
  * pipeline itself.
  *
  * State mode (r18) measures ONLY the grid-maintenance term as the
  * [[graft.streaming.StreamingIngest.dfStateTick]] stateful aggregate
  * (the A/B against the fold ticks' Θ(grid) term); the optional
  * `linesDir` names an existing `_lines` store so the state-grid read
  * face can materialize too.
  *
  * Frontier mode (r19) runs the curated tick WITH the fuzzy-URL
  * keeper stage: staging carries a url column (the q229/q230 fixture
  * spellings), so each wave pays canonicalize → persisted-index dedup
  * before ingest — the q230 composition as a stream.
  *
  * Set SPARK_GRAFT_SPOT_NO_ONESHOT=1 to skip the final one-shot
  * recompute row (reuse a prior run's column when only tick/read-face
  * terms changed — the one-shot is 21 min at ×1000).
  *
  * Usage: runMain graft.tools.CrawlTickSpot <sfDir> <workDir>
  *        [waves=3] [maxDocFreq=9] [mode=lines|curated|state|frontier]
  *        [linesDir]
  */
object CrawlTickSpot {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val work = args(1)
    def arg(i: Int, d: Int) = if (args.length > i) args(i).toInt else d
    val waves = arg(2, 3)
    val maxDf = arg(3, 9)
    val frontier = args.length > 4 && args(4) == "frontier"
    val curated = frontier || (args.length > 4 && args(4) == "curated")
    val skipOneShot = sys.env.get("SPARK_GRAFT_SPOT_NO_ONESHOT")
      .contains("1")
    val spark = ToolSession.local()
    val fsPath = new org.apache.hadoop.fs.Path(work)
    val fs = fsPath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(fsPath, true)
    val docs =
      if (frontier)
        graft.core.Tables.documents(spark, sfDir)
          .withColumn("url", expr(graft.text.TextOps.urlFixtureSql))
          .withColumn("html", expr(graft.text.Html.fixtureSql))
          .select(col("doc_id"), col("url"), col("html"))
      else graft.core.Tables.documents(spark, sfDir)
        .withColumn("html", expr(graft.text.Html.fixtureSql))
        .select(col("doc_id"), col("html"))
    val n = docs.count()
    val staging = s"$work/staging"
    val out = s"$work/corpus"
    // state mode (r18): measure ONLY the grid-maintenance term as a
    // stateful streaming aggregate (dfStateTick) — the A/B against the
    // fold ticks' Θ(grid) term; args(5) optionally names an existing
    // _lines store so the state-grid read face can materialize too
    if (args.length > 4 && args(4) == "state") {
      // RocksDB provider: the HDFS-backed default holds every
      // partition's FULL key map on-heap — measured OOM at wave 2 of
      // the ×1000 decade (14M keys vs the 8 GiB default heap); RocksDB
      // keeps the key space off-heap/on-disk, which is the contract a
      // 100 TB grid needs anyway
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val docsS = graft.core.Tables.documents(spark, sfDir)
        .withColumn("html", expr(graft.text.Html.fixtureSql))
        .select(col("doc_id"), col("html"))
      val nS = docsS.count()
      for (w <- 0 until waves) {
        docsS.filter(pmod(col("doc_id"), lit(waves)) === w)
          .write.mode("append").parquet(s"$work/staging")
        val t0 = System.nanoTime()
        graft.streaming.StreamingIngest.dfStateTick(spark,
          s"$work/staging", s"$work/gridckpt")
        println(f"[statetick] wave $w/$waves (corpus $nS docs): grid tick " +
          f"wall ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      val t1 = System.nanoTime()
      val cells = graft.streaming.StreamingIngest
        .lineDfFromState(spark, s"$work/gridckpt")
        .agg(count(lit(1)), sum(col("line_df"))).head()
      println(f"[statetick] grid read from state: ${cells.getLong(0)} " +
        f"cells / ${cells.getLong(1)} total df in " +
        f"${(System.nanoTime() - t1) / 1e9}%.1f s")
      if (args.length > 5) {
        for (r <- 1 to 3) {
          val t2 = System.nanoTime()
          val kept = graft.streaming.StreamingIngest
            .lineFilteredCorpusFromState(spark, args(5),
              s"$work/gridckpt", maxDf)
            .agg(count(lit(1)), sum(col("n_kept"))).head()
          println(f"[statetick] state-grid read face rep $r/3: " +
            f"${kept.getLong(0)} docs / ${kept.getLong(1)} kept lines in " +
            f"${(System.nanoTime() - t2) / 1e9}%.1f s")
        }
      }
      spark.stop(); return
    }
    val tag = if (frontier) "frontiertick"
      else if (curated) "curatedtick" else "crawltick"
    for (w <- 0 until waves) {
      // frontier waves split at FIXTURE-GROUP grain (doc_id/5) so a
      // group's five spellings land in one wave — first-arrival-wins
      // then equals the one-shot's min-id keeper and the final counts
      // stay comparable; the persisted-index lookup cost is identical
      // either way
      val waveKey = if (frontier) floor(col("doc_id") / 5) else col("doc_id")
      docs.filter(pmod(waveKey, lit(waves)) === w)
        .write.mode("append").parquet(staging)
      val t0 = System.nanoTime()
      if (curated)
        graft.streaming.StreamingIngest.curatedCrawlTick(spark, staging,
          out, s"$work/ckpt", maxDocFreq = maxDf.toLong,
          urlCol = if (frontier) Some("url") else None)
      else
        graft.streaming.StreamingIngest.crawlIngestTick(spark, staging, out,
          s"$work/ckpt")
      val meta = graft.sim.IndexMeta.read(spark, s"$out/_meta",
        Seq("n_docs", "n_lines", "n_ticks")).get
      println(f"[$tag] wave $w/$waves (corpus $n docs): tick wall " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s, ingested " +
        f"${meta("n_docs")} docs / ${meta("n_lines")} lines over " +
        f"${meta("n_ticks")} ticks")
    }
    if (curated) {
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        val cur = graft.pipeline.CrawlCurate.fromStores(spark, out)
          .agg(count(lit(1)), sum(col("n_tokens"))).head()
        println(f"[$tag] curated read face rep $r/3: " +
          f"${cur.getLong(0)} docs / ${cur.getLong(1)} tokens packed in " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s (no HTML/shingle " +
          "recompute)")
      }
      if (!skipOneShot) {
        val t0 = System.nanoTime()
        val osDocs =
          if (frontier) {
            // the q230 one-shot: fuzzy-URL keepers → capstone
            val keep = graft.text.TextOps.urlDedup(docs, "doc_id", "url")
              .select(col("keeper_id").as("doc_id"))
            docs.join(keep, Seq("doc_id"), "left_semi")
              .select(col("doc_id"), col("html"))
          } else docs
        val os = graft.pipeline.CrawlCurate.oneShot(osDocs,
            maxDocFreq = maxDf.toLong)
          .agg(count(lit(1)), sum(col("n_tokens"))).head()
        println(f"[$tag] one-shot recompute (the per-run cost the " +
          f"tick avoids): ${os.getLong(0)} docs / ${os.getLong(1)} " +
          f"tokens in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    } else {
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        val kept = graft.text.TextOps.lineFilteredCorpus(spark, out, maxDf)
          .agg(count(lit(1)), sum(col("n_kept"))).head()
        println(f"[$tag] read face rep $r/3: " +
          f"${kept.getLong(0)} docs / ${kept.getLong(1)} kept lines in " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s (no HTML re-parse)")
      }
      val t0 = System.nanoTime()
      val oneShot = graft.text.TextOps.lineFrequencyFilter(
        graft.text.Html.mainContent(docs, "doc_id", "html")
          .select(col("doc_id"), col("main_text")),
        "doc_id", "main_text", maxDf)
        .agg(count(lit(1)), sum(col("n_kept"))).head()
      println(f"[$tag] one-shot q224 recompute (the per-run cost the " +
        f"tick avoids): ${oneShot.getLong(0)} docs / " +
        f"${oneShot.getLong(1)} kept lines in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
