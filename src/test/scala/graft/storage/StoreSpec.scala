package graft.storage

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** T2 merge-upsert: partition layout, pruning-driven read, old-wins cell
  * precedence, untouched-partition preservation.
  */
class StoreSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("mergeUpsert: old non-null wins, gaps fill, other partitions intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("obsstore").toString + "/table"
    val store = new ObsStore(spark, dir)

    val initial = Seq(
      ("s1", ts("2023-01-05 00:00:00"), "Q", Some(1.0)),
      ("s1", ts("2023-01-05 00:05:00"), "Q", None: Option[Double]),
      ("s1", ts("2023-02-05 00:00:00"), "Q", Some(2.0)),
      ("s1", ts("2023-01-05 00:00:00"), "H", Some(9.0)))
      .toDF("station", "ts", "param", "value")
    store.write(initial)

    // batch touches only 2023-01/Q: overwrites the null cell, conflicts on
    // the non-null cell (old wins), adds a new ts
    val batch = Seq(
      ("s1", ts("2023-01-05 00:00:00"), "Q", Some(100.0)), // conflict → old 1.0
      ("s1", ts("2023-01-05 00:05:00"), "Q", Some(1.5)),   // fills gap
      ("s1", ts("2023-01-05 00:10:00"), "Q", Some(1.7)))   // new row
      .toDF("station", "ts", "param", "value")
    store.mergeUpsert(batch)

    val out = store.read()
      .select($"station", date_format($"ts", "yyyy-MM-dd HH:mm").as("t"),
        $"param", $"value")
      .as[(String, String, String, Option[Double])].collect().toSet
    assert(out === Set(
      ("s1", "2023-01-05 00:00", "Q", Some(1.0)),
      ("s1", "2023-01-05 00:05", "Q", Some(1.5)),
      ("s1", "2023-01-05 00:10", "Q", Some(1.7)),
      ("s1", "2023-02-05 00:00", "Q", Some(2.0)),   // untouched partition
      ("s1", "2023-01-05 00:00", "H", Some(9.0)))) // untouched param

    // physical layout: hive-style (yyyymm, param) directories
    val parts = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("yyyymm")).sorted
    assert(parts.toSeq === Seq("yyyymm=202301", "yyyymm=202302"))
  }
}
