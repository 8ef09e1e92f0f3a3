package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.export.Exports
import graft.text.{NearDup, Terms, TextOps}

/** End-to-end corpus curation CLI — the session's operators wired the
  * way a practitioner runs them, from raw documents to training shards
  * plus a data card:
  *
  *   1. quality gate        (TextOps.qualityScore >= minQuality)
  *   2. capped exact dedup  (NearDup.dedupCapped, keep <= maxCopies)
  *   3. duplicated-span trim (NearDup.trimSpans over the survivors —
  *      cut corpus-duplicated runs, keep the unique remainder)
  *   4. shard + pack        (shard by lang, chunk offsets from
  *      Terms.packPrepared)
  *   5. sink                (Exports.writeTrainingShards: range-
  *      partitioned, contiguous in-file chunk ranges) + a one-pass
  *      (lang, source) data card written as JSON lines.
  *
  * Stage ORDER mirrors the q61 audit: drops before trims (no point
  * trimming a doc the cap deletes), trims before packing (offsets
  * depend on the final text), the card over the SHIPPED corpus.
  *
  * Stage 3's repeat threshold is DERIVED from stage 2's cap:
  * `minOccurrences = maxCopies + 1`. With the two decoupled (e.g. both
  * defaulting to 2) every exact-duplicate pair the cap deliberately
  * kept has all its n-grams at corpus count >= 2, so the trim deletes
  * BOTH copies wholesale — the cap's contract silently inverted. Tying
  * the threshold to the cap means the trim only fires on repetition
  * EXCEEDING what the cap allows (CurateSpec pins the composition).
  *
  * Usage:
  *   runMain graft.tools.Curate <sfDir> <outDir> [minQuality=0.4]
  *     [maxCopies=2] [minSpanTokens=24] [blockTokens=256]
  */
object Curate {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: Curate <sfDir> <outDir> [minQuality] [maxCopies] [minSpanTokens] [blockTokens]")
    val spark = ToolSession.local()
    try run(spark, args(0), args(1),
      minQuality = args.lift(2).map(_.toDouble).getOrElse(0.4),
      maxCopies = args.lift(3).map(_.toInt).getOrElse(2),
      minSpanTokens = args.lift(4).map(_.toLong).getOrElse(24L),
      blockTokens = args.lift(5).map(_.toInt).getOrElse(256))
    finally spark.stop()
  }

  /** The pipeline body, session-injected so specs drive it on the shared
    * test session (main owns session lifecycle, run() owns none).
    * Returns the shipped packed-row count.
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          minQuality: Double, maxCopies: Int, minSpanTokens: Long,
          blockTokens: Int): Long = {
    val docs = Tables.documents(spark, sfDir)
    // 1. quality gate
    val gated = docs.filter(TextOps.qualityScore(col("text")) >= minQuality)
    // 2. capped exact dedup (keeps lowest-id copies)
    val kept = NearDup.dedupCapped(gated, "doc_id", "text", maxCopies)
      .select("doc_id")
    val deduped = gated.join(kept, Seq("doc_id"), "left_semi")
    // 3. trim runs repeated MORE than the cap allows (see object doc);
    //    docs trimmed to nothing drop out
    val trimmed = NearDup.trimSpans(deduped, "doc_id", "text",
        n = 8, minOccurrences = maxCopies + 1L, minSpanTokens = minSpanTokens)
      .join(deduped.select("doc_id", "lang", "source"), Seq("doc_id"))
      // two independent write actions follow (shard sink + data card);
      // without materialization each would recompute the gate -> dedup
      // -> span-trim chain from the scan — the costliest work, twice
      .persist()
    try {
      // 4. per-lang shards, packed chunk offsets over the trimmed text
      val packed = Terms.packPrepared(
        trimmed.select(col("doc_id"), col("lang").as("shard"),
          col("n_tokens_kept").as("n_tokens")),
        blockTokens = blockTokens, orderCols = Seq("doc_id"))
      // 5a. shard sink: contiguous chunk ranges per file
      Exports.writeTrainingShards(
        packed.join(trimmed.select(col("doc_id"), col("text_trimmed")), Seq("doc_id")),
        s"$outDir/shards", "shard", Seq("chunk", "doc_id"), rowsPerFile = 10000)
      // 5b. data card over the shipped corpus (q75's one-pass CUBE);
      //     grouping flags disambiguate CUBE's NULL placeholders from
      //     genuinely-NULL lang/source groups
      trimmed.cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens_kept")).as("n_tokens"),
          (grouping(col("lang")) === 1).as("lang_total"),
          (grouping(col("source")) === 1).as("source_total"))
        .coalesce(1).write.mode("overwrite").json(s"$outDir/data_card")
      val nShipped = spark.read.parquet(s"$outDir/shards").count()
      println(s"[curate] shipped $nShipped packed rows to $outDir/shards " +
        s"(minQuality=$minQuality, maxCopies=$maxCopies, minSpanTokens=$minSpanTokens)")
      nShipped
    } finally trimmed.unpersist()
  }
}
