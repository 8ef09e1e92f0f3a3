package graft.tools

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurateSpec extends SparkSpec {

  test("curate pipeline ships packed shards + data card from sf0.001") {
    val out = java.nio.file.Files.createTempDirectory("graft-curate").toString
    val n = Curate.run(spark, "/root/testdata/sf0.001", out,
      minQuality = 0.4, maxCopies = 2, minSpanTokens = 24L, blockTokens = 256)
    assert(n > 0, "pipeline must ship rows")
    val shards = spark.read.parquet(s"$out/shards")
    // sink contract: every (shard=) directory's files carry contiguous
    // chunk ranges and the trimmed text rides each row
    assert(shards.columns.toSet.contains("text_trimmed"))
    assert(shards.filter(col("n_tokens") <= 0).count() === 0)
    // offsets tile per shard: min start is 0 and max end == sum(n_tokens)
    val tiles = shards.groupBy("shard")
      .agg(min("start_tok").as("lo"),
           max(col("start_tok") + col("n_tokens")).as("hi"),
           sum("n_tokens").as("tot"))
      .filter(col("lo") =!= 0L || col("hi") =!= col("tot"))
    assert(tiles.count() === 0, "per-shard offsets must tile the token stream")
    // data card: the grand-total row (grouping FLAGS, not null-matching —
    // CUBE's placeholders are indistinguishable from genuinely-null
    // groups otherwise) equals the shipped doc count
    val card = spark.read.json(s"$out/data_card")
    val total = card.filter(col("lang_total") && col("source_total"))
      .select("n_docs").head().getLong(0)
    assert(total === shards.select("doc_id").distinct().count())
  }

  test("the cap and the trim compose: capped duplicates SURVIVE the trim") {
    import spark.implicits._
    // the failure mode this pins: with minOccurrences decoupled from
    // maxCopies, an exact-duplicate pair the cap kept has every 8-gram
    // at corpus count 2 and the trim deletes BOTH copies wholesale
    val dupText = (0 until 40).map(i => s"tok$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-curate-in").toString
    val out = java.nio.file.Files.createTempDirectory("graft-curate-out").toString
    Seq(
      (1L, dupText, "en", "web", dupText.length.toLong),
      (2L, dupText, "en", "web", dupText.length.toLong),
      (3L, dupText, "en", "web", dupText.length.toLong), // 3rd copy: capped away
      (4L, (100 until 140).map(i => s"u$i").mkString(" "), "en", "web", 200L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Curate.run(spark, dir, out,
      minQuality = 0.0, maxCopies = 2, minSpanTokens = 24L, blockTokens = 256)
    val shipped = spark.read.parquet(s"$out/shards")
      .select("doc_id").distinct().as[Long].collect().toSet
    // cap keeps 1,2 (drops 3); the trim must keep what the cap kept
    assert(shipped === Set(1L, 2L, 4L),
      "duplicates the cap deliberately kept must not be trim-deleted")
  }
}
