package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Operator semantics with hand-computed goldens (SURVEY §5.1): D1 ties,
  * J3 vs J9 precedence duality, A3 recurrence incl. null hours, A4
  * tail-patch, W1 bounded ffill.
  */
class OpsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dedupFirst keeps exactly the first row per key under the order") {
    import spark.implicits._
    val df = Seq(
      ("a", 1, "x"), ("a", 2, "y"), ("b", 5, "z"), ("b", 4, "w"))
      .toDF("k", "ord", "v")
    val out = Dedup.dedupFirst(df, Seq("k"), Seq(col("ord")))
      .select("k", "v").as[(String, String)].collect().toMap
    assert(out === Map("a" -> "x", "b" -> "w"))
  }

  test("combineFirst: OLD wins; updateWith: NEW wins (J3/J9 duality)") {
    import spark.implicits._
    val old = Seq(("k1", Some(1.0)), ("k2", None: Option[Double]), ("k3", Some(3.0)))
      .toDF("k", "value")
    val nw = Seq(("k1", Some(10.0)), ("k2", Some(20.0)), ("k4", Some(40.0)))
      .toDF("k", "value")
    val cf = Merge.combineFirst(old, nw, Seq("k"), Seq("value"))
      .as[(String, Option[Double])].collect().toMap
    assert(cf === Map("k1" -> Some(1.0), "k2" -> Some(20.0),
      "k3" -> Some(3.0), "k4" -> Some(40.0)))
    val up = Merge.updateWith(old, nw, Seq("k"), Seq("value"))
      .as[(String, Option[Double])].collect().toMap
    assert(up === Map("k1" -> Some(10.0), "k2" -> Some(20.0),
      "k3" -> Some(3.0), "k4" -> Some(40.0)))
  }

  test("combineFirst is idempotent: merge(merge(a,b),b) == merge(a,b)") {
    import spark.implicits._
    val a = Seq(("k1", Some(1.0)), ("k2", None: Option[Double])).toDF("k", "value")
    val b = Seq(("k2", Some(2.0)), ("k3", Some(3.0))).toDF("k", "value")
    val once = Merge.combineFirst(a, b, Seq("k"), Seq("value"))
    val twice = Merge.combineFirst(once, b, Seq("k"), Seq("value"))
    assert(once.as[(String, Option[Double])].collect().toMap ===
           twice.as[(String, Option[Double])].collect().toMap)
  }

  test("ffill bounded: fills only up to cutoff, never overwrites non-null") {
    import spark.implicits._
    val df = Seq(
      ("s", 1, Some(10.0)), ("s", 2, None: Option[Double]),
      ("s", 3, Some(30.0)), ("s", 4, None: Option[Double]),
      ("s", 5, None: Option[Double])).toDF("k", "ord", "v")
    val out = Fill.ffill(df, Seq("k"), Seq(col("ord")), "v", "f",
        cutoff = Some(col("ord") <= 4))
      .orderBy("ord").select("f").as[Option[Double]].collect().toSeq
    assert(out === Seq(Some(10.0), Some(10.0), Some(30.0), Some(30.0), None))
  }

  test("tailPatch replaces only the last non-null bucket with lastVal") {
    import spark.implicits._
    val df = Seq(
      ("s", ts("2023-01-01 00:00:00"), Some(5.0), Some(7.0)),
      ("s", ts("2023-01-02 00:00:00"), Some(6.0), Some(9.0)),
      ("s", ts("2023-01-03 00:00:00"), None: Option[Double], None: Option[Double]))
      .toDF("k", "bucket", "mean_value", "last_value")
    val out = Resample.tailPatch(df, Seq("k"), "bucket", "mean_value", "last_value")
      .orderBy("bucket").select("mean_value").as[Option[Double]].collect().toSeq
    assert(out === Seq(Some(5.0), Some(9.0), None))
  }

  test("resample: mean/max/last-non-null per bucket (pandas .last skips null)") {
    import spark.implicits._
    val df = Seq(
      ("s", ts("2023-01-01 00:05:00"), Some(1.0)),
      ("s", ts("2023-01-01 00:55:00"), None: Option[Double]),
      ("s", ts("2023-01-01 00:30:00"), Some(3.0))).toDF("k", "ts", "value")
    val r = Resample.resample(df, Seq("k"), "ts", "value", "hour")
      .select("mean_value", "max_value", "last_value").head()
    assert(r.getDouble(0) === 2.0 && r.getDouble(1) === 3.0 && r.getDouble(2) === 3.0)
  }

  test("rising/falling recurrence matches the pandas loop incl. null hours") {
    import spark.implicits._
    // m=max, l=last per hour; pandas: h0=m0; h_i = l_i if m_i <= h_{i-1} else m_i
    // null m compares false => take m (null) — the reference's flagged NaN path
    val df = Seq(
      ("s", ts("2023-01-01 00:00:00"), Some(5.0), Some(4.0)),  // h=5 (first)
      ("s", ts("2023-01-01 01:00:00"), Some(7.0), Some(6.0)),  // 7>5  => 7
      ("s", ts("2023-01-01 02:00:00"), Some(6.0), Some(5.5)),  // 6<=7 => last 5.5
      ("s", ts("2023-01-01 03:00:00"), None, None),            // null m => null
      ("s", ts("2023-01-01 04:00:00"), Some(4.0), Some(3.0)))  // prev null => m=4
      .toDF("k", "bucket", "maxV", "lastV")
    val out = Recurrence.risingFalling(spark, df, "k", "bucket", "maxV", "lastV")
      .orderBy("bucket").select("h").as[Option[Double]].collect().toSeq
    assert(out === Seq(Some(5.0), Some(7.0), Some(5.5), None, Some(4.0)))
  }

  test("interpolate: bracketed nulls filled linearly; edges stay null; QC nulls out-of-range") {
    import spark.implicits._
    val df = Seq(
      (1, ts("2023-01-01 00:00:00"), Some(-5.0)),  // QC: out of range → null (leading)
      (2, ts("2023-01-01 00:10:00"), Some(10.0)),  // anchor
      (3, ts("2023-01-01 00:20:00"), None: Option[Double]), // bracketed → 15.0
      (4, ts("2023-01-01 00:30:00"), Some(20.0)),  // anchor
      (5, ts("2023-01-01 00:40:00"), None: Option[Double])) // trailing → null
      .toDF("id", "t", "v")
    val qcd = Interpolate.nullifyOutOfRange(df.withColumn("k", lit("s")), "v", 0.0, 100.0)
    val out = Interpolate.linearInterpolate(qcd, Seq("k"), "t",
        Seq(col("t")), "v", "vi")
      .orderBy("id").select("vi").as[Option[Double]].collect().toSeq
    assert(out === Seq(None, Some(10.0), Some(15.0), Some(20.0), None))
  }

  test("yearRollover: non-first duplicates get exactly +1 year") {
    import spark.implicits._
    val df = Seq(
      (1, ts("2023-01-01 00:00:00")), (2, ts("2023-01-01 00:00:00")),
      (3, ts("2023-01-01 00:00:00")), (4, ts("2023-06-01 00:00:00")))
      .toDF("ord", "t")
    val out = Dedup.yearRollover(df, Seq("t"), Seq(col("ord")), "t")
      .orderBy("ord").select(year(col("t"))).as[Int].collect().toSeq
    assert(out === Seq(2023, 2024, 2024, 2023))
  }

  test("saltedJoin: left join preserves unmatched big-side rows exactly once; outer rejected") {
    import spark.implicits._
    val big = Seq((1L, "a"), (2L, "zzz"), (3L, "a")).toDF("id", "k")
    val small = Seq(("a", 1)).toDF("k", "m")
    val out = Skew.saltedJoin(big, small, Seq("k"), salts = 4,
        joinType = "left")
      .select($"id", $"m".cast("string"))
      .as[(Long, Option[String])].collect().toSet
    assert(out === Set((1L, Some("1")), (2L, None), (3L, Some("1"))))
    // replication makes right/full outer unsound (one row per replica)
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, Seq("k"), salts = 4, joinType = "full")
    }
  }
}
