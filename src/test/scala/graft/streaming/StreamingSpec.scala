package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.storage.ObsStore

/** T1-T4 streaming semantics: AvailableNow drain, foreachBatch
  * merge-upsert precedence across ticks, source-side file tracking.
  */
class StreamingSpec extends SparkSpec {

  test("streaming dedup drops re-delivered observations across batches") {
    import org.apache.spark.sql.streaming.Trigger
    val base = Files.createTempDirectory("sdedup").toString
    Files.createDirectories(Paths.get(s"$base/in"))
    // same (station, ts, param) delivered twice within one drain
    Files.writeString(Paths.get(s"$base/in/a.csv"),
      "station,ts,param,value\ns1,2023-01-05 00:00:00,Q,1.0\n")
    Files.writeString(Paths.get(s"$base/in/b.csv"),
      "station,ts,param,value\ns1,2023-01-05 00:00:00,Q,1.0\n" +
      "s1,2023-01-05 00:05:00,Q,2.0\n")
    val out = s"$base/out"
    val q = StreamingIngest.dedupStream(
        StreamingIngest.readObsStream(spark, s"$base/in"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$base/ckpt")
      .format("parquet").option("path", out)
      .start()
    q.awaitTermination()
    assert(spark.read.parquet(out).count() === 2) // dup dropped
  }

  test("two ingest ticks: drain, upsert, no reprocessing, old-wins merge") {
    import spark.implicits._
    val base = Files.createTempDirectory("stream").toString
    val staging = s"$base/staging"
    val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(staging))
    val store = new ObsStore(spark, s"$base/table")

    // tick 1: two observations
    Files.writeString(Paths.get(s"$staging/batch1.csv"),
      "station,ts,param,value\n" +
      "s1,2023-01-05 00:00:00,Q,1.0\n" +
      "s1,2023-01-05 00:05:00,Q,\n")
    StreamingIngest.ingestTick(spark, staging, store, ckpt)
    assert(store.read().count() === 2)

    // tick 2: a revision (loses: old wins), a gap-fill (wins), a new row;
    // batch1.csv must NOT be reprocessed (source tracking replaces f_read)
    Files.writeString(Paths.get(s"$staging/batch2.csv"),
      "station,ts,param,value\n" +
      "s1,2023-01-05 00:00:00,Q,999.0\n" +
      "s1,2023-01-05 00:05:00,Q,1.5\n" +
      "s1,2023-02-01 00:00:00,Q,2.0\n")
    StreamingIngest.ingestTick(spark, staging, store, ckpt)

    val out = store.read()
      .select($"station", date_format($"ts", "MM-dd HH:mm").as("t"), $"value")
      .as[(String, String, Option[Double])].collect().toSet
    assert(out === Set(
      ("s1", "01-05 00:00", Some(1.0)),   // revision rejected (old wins)
      ("s1", "01-05 00:05", Some(1.5)),   // gap filled
      ("s1", "02-01 00:00", Some(2.0))))  // new month partition
  }
}
