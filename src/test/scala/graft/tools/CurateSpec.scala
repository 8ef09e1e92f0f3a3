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
    // data card: the grand-total row equals the shipped doc count
    val card = spark.read.json(s"$out/data_card")
    val total = card.filter(col("lang").isNull && col("source").isNull)
      .select("n_docs").head().getLong(0)
    assert(total === shards.select("doc_id").distinct().count())
  }
}
