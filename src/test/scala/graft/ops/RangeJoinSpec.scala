package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("intervalPointJoin == the naive non-equi join, matches exactly once") {
    import spark.implicits._
    val iv = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-10 00:00:00")),
      (2L, ts("2024-01-05 00:00:00"), ts("2024-01-05 00:00:00")), // degenerate
      (3L, ts("2024-02-01 00:00:00"), ts("2024-03-15 00:00:00"))  // many bins
    ).toDF("iv_id", "s", "e")
    val pts = Seq(
      (10L, ts("2024-01-01 00:00:00")), // inclusive start boundary of 1
      (11L, ts("2024-01-10 00:00:00")), // inclusive end boundary of 1
      (12L, ts("2024-01-05 00:00:00")), // degenerate interval hit
      (13L, ts("2024-02-20 12:34:56")),
      (14L, ts("2025-01-01 00:00:00"))  // no match
    ).toDF("p_id", "p")
    // a bin width that does NOT divide any boundary cleanly
    val got = RangeJoin.intervalPointJoin(iv, pts, "s", "e", "p", binSeconds = 100000L)
      .select("iv_id", "p_id").as[(Long, Long)].collect().sorted.toSeq
    val want = iv.crossJoin(pts)
      .filter(col("s") <= col("p") && col("p") <= col("e"))
      .select("iv_id", "p_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got === want)
    assert(got === Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 12L), (3L, 13L)))
    // exactly once: no duplicate matches from multi-bin intervals
    assert(got.distinct === got)
  }

  test("intervalOverlapJoin == the naive overlap join, each pair exactly once") {
    import spark.implicits._
    val a = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-20 00:00:00")), // spans many bins
      (2L, ts("2024-01-19 00:00:00"), ts("2024-01-19 12:00:00")),
      (3L, ts("2024-03-01 00:00:00"), ts("2024-03-02 00:00:00"))  // overlaps nothing
    ).toDF("a_id", "sa", "ea")
    val b = Seq(
      (10L, ts("2024-01-18 00:00:00"), ts("2024-02-10 00:00:00")), // overlaps 1 and 2
      (11L, ts("2024-01-20 00:00:00"), ts("2024-01-25 00:00:00")), // touches 1's end
      (12L, ts("2023-12-01 00:00:00"), ts("2023-12-31 23:59:59"))  // ends before 1
    ).toDF("b_id", "sb", "eb")
    val got = RangeJoin.intervalOverlapJoin(a, b, "sa", "ea", "sb", "eb", 100000L)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    val want = a.crossJoin(b)
      .filter(col("sa") <= col("eb") && col("sb") <= col("ea"))
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got === want)
    assert(got === Seq((1L, 10L), (1L, 11L), (2L, 10L)))
    assert(got.distinct === got, "multi-shared-bin pairs must not duplicate")
  }

  test("intervalPointJoin plans as an equi-join, not a nested loop") {
    import spark.implicits._
    val iv = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-10 00:00:00")))
      .toDF("iv_id", "s", "e")
    val pts = Seq((10L, ts("2024-01-02 00:00:00"))).toDF("p_id", "p")
    val plan = RangeJoin.intervalPointJoin(iv, pts, "s", "e", "p", 86400L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"binned construction must yield an equi-join:\n$plan")
  }
}
