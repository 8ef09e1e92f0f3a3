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

  test("K5 putWithVersionPurgeRetry: purge unblocks a failing put, layered versions drain") {
    // fake store mirroring the reference failure mode: put fails while
    // non-current versions exist; versions sit in layers that only become
    // visible as the previous layer is deleted (discharge_obs_pd.py:281-330)
    class FakeStore extends VersionedObjectStore {
      var layers = List(Seq("v3", "v2"), Seq("v1")) // stacked versions
      var puts = 0
      var putLog = List.empty[String]
      override def put(localPath: String, storePath: String): Unit = {
        puts += 1
        if (layers.nonEmpty) throw new RuntimeException("S3Error: version bloat")
        putLog ::= s"$localPath->$storePath"
      }
      override def listNonCurrentVersions(storePath: String): Seq[String] =
        layers.headOption.getOrElse(Seq.empty)
      override def deleteVersions(storePath: String, versionIds: Seq[String]): Unit = {
        assert(versionIds === layers.head, "must delete the visible layer")
        layers = layers.tail
      }
    }
    val store = new FakeStore
    StoreMaintenance.putWithVersionPurgeRetry(store, "/tmp/a.parquet", "obs/a.parquet")
    assert(store.puts === 2)                       // fail, purge, retry once
    assert(store.layers.isEmpty)                   // both layers drained
    assert(store.putLog === List("/tmp/a.parquet->obs/a.parquet"))

    // healthy store: single put, no purge
    val ok = new FakeStore { layers = Nil }
    StoreMaintenance.putWithVersionPurgeRetry(ok, "/tmp/b.parquet", "obs/b.parquet")
    assert(ok.puts === 1)

    // a store that never converges hits the round guard instead of hanging
    val stuck = new FakeStore {
      override def listNonCurrentVersions(p: String): Seq[String] = Seq("ghost")
      override def deleteVersions(p: String, v: Seq[String]): Unit = ()
    }
    intercept[IllegalStateException] {
      StoreMaintenance.purgeNonCurrentVersions(stuck, "obs/c.parquet", maxRounds = 5)
    }
  }
}
