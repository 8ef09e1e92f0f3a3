package graft.export

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** K2 single-file CSV export and K6 CSV→parquet conversion (previously
  * spec-less boundary rows in the coverage table).
  */
class ExportsSpec extends SparkSpec {

  test("K2 writeCsv: one headered file, values round-trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("exp").toString + "/out"
    val df = Seq(("08MF005", "2023-01-01", Some(1234.5)),
                 ("08MG00A", "2023-01-02", None: Option[Double]))
      .toDF("station", "day", "value")
    Exports.writeCsv(df, dir)
    val parts = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".csv"))
    assert(parts.length === 1, "coalesce(1) must produce a single CSV part")
    val back = spark.read.option("header", "true").csv(dir)
      .select($"station", $"day", $"value".cast("double"))
      .as[(String, String, Option[Double])].collect().toSet
    assert(back === Set(("08MF005", "2023-01-01", Some(1234.5)),
                        ("08MG00A", "2023-01-02", None)))
  }

  test("K6 csvToParquet: schema inferred, rows preserved") {
    import spark.implicits._
    val base = Files.createTempDirectory("exp").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", -2.0)).toDF("id", "k", "v")
    Exports.writeCsv(df, s"$base/csv")
    Exports.csvToParquet(spark, s"$base/csv", s"$base/pq")
    val back = spark.read.parquet(s"$base/pq")
      .select($"id".cast("long"), $"k", $"v".cast("double"))
      .as[(Long, String, Double)].collect().toSet
    assert(back === Set((1L, "a", 1.5), (2L, "b", -2.0)))
  }

  test("training shards: per-shard dirs, file row cap, contiguous chunk ranges") {
    import spark.implicits._
    val dir = Files.createTempDirectory("shards").toString + "/out"
    // two shards, 100 packed rows each, files capped at 30 rows
    val rows = for (sh <- Seq("en", "de"); i <- 0 until 100)
      yield (sh, i.toLong, i.toLong / 10)
    Exports.writeTrainingShards(rows.toDF("shard", "doc_id", "chunk"),
      dir, "shard", orderCols = Seq("chunk", "doc_id"), rowsPerFile = 30)
    val root = new java.io.File(dir)
    val shardDirs = root.listFiles.filter(_.isDirectory).map(_.getName).toSet
    assert(shardDirs === Set("shard=en", "shard=de"))
    shardDirs.foreach { sd =>
      val files = new java.io.File(root, sd).listFiles
        .filter(_.getName.endsWith(".parquet"))
      // 100 rows / cap 30 -> every file within the cap, >= 4 files total
      assert(files.nonEmpty)
      files.foreach { f =>
        val n = spark.read.parquet(f.getPath).count()
        assert(n <= 30, s"$sd/${f.getName} exceeds the row cap: $n")
      }
      // each FILE must hold a contiguous doc range (sorted within
      // partitions + maxRecordsPerFile rolling preserves order)
      files.foreach { f =>
        val ids = spark.read.parquet(f.getPath)
          .select($"doc_id").as[Long].collect().sorted
        assert(ids.last - ids.head === ids.length - 1,
          s"$sd/${f.getName} holds a non-contiguous doc range")
      }
    }
    // nothing lost or duplicated through the routing
    assert(spark.read.parquet(dir).count() === 200)
  }
}
