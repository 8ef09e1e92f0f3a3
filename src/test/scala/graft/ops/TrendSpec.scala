package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Trend operators: EWMA-vs-recurrence parity, window/tail branches and
  * tie-breaks the synthetic events can't pin, CUSUM hand cases, and the
  * PAVA isotonic fit (driver-walk tail, no oracle by design).
  */
class TrendSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, Long, Double)]) =
    rows.toDF("user_id", "tsu", "event_id", "value")
      .withColumn("ts", timestamp_micros(col("tsu"))).drop("tsu")

  test("ewmaLastK matches the sequential recurrence when n <= k") {
    val xs = Seq(10.0, 20.0, 5.0, 40.0)
    val df = ev(xs.zipWithIndex.map { case (x, i) => (1L, i * 1000000L, i.toLong, x) })
    val out = Trend.ewmaLastK(df, "user_id", "value",
      Seq(col("ts"), col("event_id")), alpha = 0.05, k = 64).head()
    // reference: snapped-weight unroll equals the operator's contract;
    // check it against the RAW recurrence within snapping tolerance
    var s = xs.head
    xs.tail.foreach(x => s = 0.05 * x + 0.95 * s)
    val got = out.getAs[Long]("ewma_micro")
    assert(math.abs(got - s * 1e6) < xs.length + 1,
      s"snapped unroll $got vs recurrence ${s * 1e6}")
    assert(out.getAs[Long]("n_events") == 4L)
  }

  test("ewmaLastK: events beyond the window are ignored; oldest in-window gets the tail weight") {
    // n = 70 > k = 4: only the newest 4 count, the 4th carries beta^3
    val df = ev((0 until 70).map(i => (1L, i * 1000000L, i.toLong, 100.0)))
    val out = Trend.ewmaLastK(df, "user_id", "value",
      Seq(col("ts"), col("event_id")), alpha = 0.25, k = 4).head()
    // constant series: EWMA = x exactly when weights sum to 1; snapped
    // weights sum to floor-rounded parts of 1e9 → within 4 nano-units
    val got = out.getAs[Long]("ewma_micro")
    assert(math.abs(got - 100000000L) <= 1L, s"constant series must smooth to itself: $got")
    assert(out.getAs[Long]("n_events") == 70L)
  }

  test("ewmaLastK: equal timestamps break ties by event_id (newest = highest id)") {
    val sameTs = Seq((1L, 0L, 1L, 10.0), (1L, 0L, 2L, 90.0))
    val out = Trend.ewmaLastK(ev(sameTs), "user_id", "value",
      Seq(col("ts"), col("event_id")), alpha = 0.5, k = 8).head()
    // rk1 = event 2 (value 90, weight α=0.5), rk2 = event 1 (tail 0.5)
    assert(out.getAs[Long]("ewma_micro") == 50000000L)
    // flipping ids flips nothing here (weights equal at α=0.5) — use an
    // asymmetric α to actually pin the orientation
    val out2 = Trend.ewmaLastK(ev(sameTs), "user_id", "value",
      Seq(col("ts"), col("event_id")), alpha = 0.25, k = 8).head()
    // newest (id 2, 90.0) gets α = 0.25; oldest (id 1, 10.0) gets 0.75
    assert(out2.getAs[Long]("ewma_micro") == 30000000L)
  }

  test("cusumChangepoint finds a hand-planted mean shift, ties to smallest k") {
    // 5 at 10.0 then 5 at 50.0 → split at k = 5
    val df = ev((0 until 10).map(i =>
      (1L, i * 1000000L, i.toLong, if (i < 5) 10.0 else 50.0)))
    val out = Trend.cusumChangepoint(df, "user_id",
      floor(col("value") * 100 + lit(0.5)).cast("long"),
      Seq(col("ts"), col("event_id"))).head()
    assert(out.getAs[Long]("cp_k") == 5L)
    // D_5 = |10·5000 − 5·30000| = 100000 (centi units)
    assert(out.getAs[Long]("dmax") == 100000L)
    // normalized: 100000 / (10 · 30000) = 1/3
    assert(out.getAs[Long]("cusum_micro") == 333333L)
    // constant series: every interior |D| = 0 → tie → smallest k = 1
    val flat = ev((0 until 6).map(i => (2L, i * 1000000L, i.toLong, 7.0)))
    val f = Trend.cusumChangepoint(flat, "user_id",
      floor(col("value") * 100 + lit(0.5)).cast("long"),
      Seq(col("ts"), col("event_id"))).head()
    assert(f.getAs[Long]("cp_k") == 1L && f.getAs[Long]("dmax") == 0L)
    // singleton user: no interior split → dropped
    val single = ev(Seq((3L, 0L, 0L, 5.0)))
    assert(Trend.cusumChangepoint(single, "user_id",
      floor(col("value") * 100 + lit(0.5)).cast("long"),
      Seq(col("ts"), col("event_id"))).count() == 0L)
  }

  test("isotonicFit: PAVA pools violators, preserves mass, stays monotone") {
    import graft.text.Calibrate
    // rates by cell: 0.2, 0.8, 0.4 → cells 2,3 pool to 0.6
    val rows =
      Seq.fill(8)((1L, false)) ++ Seq.fill(2)((1L, true)) ++   // 0.2
      Seq.fill(2)((2L, false)) ++ Seq.fill(8)((2L, true)) ++   // 0.8
      Seq.fill(6)((3L, false)) ++ Seq.fill(4)((3L, true))      // 0.4
    val d = rows.toDF("s", "y")
    val out = Calibrate.isotonicFit(d, col("s"), col("y"))
      .orderBy("score_lo").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("score_lo") == 1L && out(0).getAs[Long]("rate_micro") == 200000L)
    assert(out(1).getAs[Long]("score_lo") == 2L && out(1).getAs[Long]("score_hi") == 3L)
    assert(out(1).getAs[Long]("n") == 20L && out(1).getAs[Long]("pos") == 12L)
    assert(out(1).getAs[Long]("rate_micro") == 600000L)
    // globally decreasing → single pooled block at the overall rate
    val dec = (Seq.fill(9)((1L, true)) ++ Seq.fill(1)((1L, false)) ++
      Seq.fill(1)((2L, true)) ++ Seq.fill(9)((2L, false))).toDF("s", "y")
    val one = Calibrate.isotonicFit(dec, col("s"), col("y")).collect()
    assert(one.length == 1 && one.head.getAs[Long]("rate_micro") == 500000L)
    // monotone invariant on arbitrary data
    val rnd = (1 to 200).map(i => ((i % 13).toLong, (i * 7 % 3) == 0)).toDF("s", "y")
    val fit = Calibrate.isotonicFit(rnd, col("s"), col("y"))
      .orderBy("score_lo").collect()
    val rates = fit.map(_.getAs[Long]("rate_micro")).toSeq
    assert(rates == rates.sorted, s"fitted rates must be nondecreasing: $rates")
    assert(fit.map(_.getAs[Long]("n")).sum == 200L)
    intercept[IllegalArgumentException] {
      Calibrate.isotonicFit(rnd, col("s"), col("y"), maxCells = 3L)
    }
    // canonical form (r13): adjacent blocks with EQUAL rates pool — the
    // fitted function is unchanged but the block set now equals the
    // minimax level sets the q212 oracle replays. 0.5, 0.5 → one block.
    val eq = (Seq.fill(1)((1L, true)) ++ Seq.fill(1)((1L, false)) ++
      Seq.fill(2)((2L, true)) ++ Seq.fill(2)((2L, false))).toDF("s", "y")
    val canon = Calibrate.isotonicFit(eq, col("s"), col("y")).collect()
    assert(canon.length == 1 && canon.head.getAs[Long]("n") == 6L &&
      canon.head.getAs[Long]("rate_micro") == 500000L)
    // and block rates are STRICTLY increasing on the mixed fixture
    assert(rates == rates.distinct.sorted,
      s"canonical block rates must strictly increase: $rates")
  }

  test("isotonicFit equals the minimax closed form on random histograms (q212 oracle contract)") {
    import graft.text.Calibrate
    // the q212 oracle replays PAVA as ŷ_i = max_{j≤i} min_{k≥i}
    // rate(j..k); this property pin is the engine-side proof that the
    // sequential pooling and the closed form agree on ARBITRARY cell
    // histograms (exact BigInt rational comparisons on the reference
    // side — no fixed-point key needed at spec scale), so the oracle
    // equivalence can never hinge on the three committed fixtures
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 25) {
      val cells = (0 until (2 + rnd.nextInt(9))).map { s =>
        val n = 1 + rnd.nextInt(9)
        (s.toLong, n, rnd.nextInt(n + 1))
      }
      val rows = cells.flatMap { case (s, n, pos) =>
        Seq.fill(pos)((s, true)) ++ Seq.fill(n - pos)((s, false))
      }
      val fit = Calibrate.isotonicFit(rows.toDF("s", "y"), col("s"), col("y"))
        .orderBy("score_lo")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      // reference: per-cell minimax fitted value as an exact rational,
      // then blocks = maximal runs of equal fitted value
      val cn = cells.map(c => BigInt(c._2))
      val cp = cells.map(c => BigInt(c._3))
      def rate(j: Int, k: Int): (BigInt, BigInt) =
        ((j to k).map(cp).sum, (j to k).map(cn).sum)
      def lt(a: (BigInt, BigInt), b: (BigInt, BigInt)) = a._1 * b._2 < b._1 * a._2
      val fitted = cells.indices.map { i =>
        cells.indices.filter(_ <= i).map { j =>
          cells.indices.filter(_ >= i).map(k => rate(j, k))
            .reduce((a, b) => if (lt(a, b)) a else b)
        }.reduce((a, b) => if (lt(a, b)) b else a)
      }
      val blocks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var i = 0
      while (i < cells.length) {
        var k = i
        while (k + 1 < cells.length &&
          fitted(k + 1)._1 * fitted(i)._2 == fitted(i)._1 * fitted(k + 1)._2) k += 1
        val n = (i to k).map(cells(_)._2.toLong).sum
        val pos = (i to k).map(cells(_)._3.toLong).sum
        blocks += ((cells(i)._1, cells(k)._1, n, pos))
        i = k + 1
      }
      assert(fit === blocks.toSeq,
        s"PAVA vs minimax diverged on cells $cells:\n  pava:    $fit\n  minimax: ${blocks.toSeq}")
    }
  }

  test("theilSen cap: md5-rank subsample bounds pairs, inert below the cap, deterministic (VERDICT r16 #5)") {
    // user 1: 10 hourly events (45 exact pairs); user 2: 3 events (under cap)
    val rows = (0 until 10).map(i => (1L, i * 3600000000L, i.toLong, 10.0 + i)) ++
      Seq((2L, 0L, 100L, 1.0), (2L, 3600000000L, 101L, 2.0),
        (2L, 7200000000L, 102L, 3.0))
    val evp = ev(rows)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tus"),
        floor(col("value") * lit(100) + lit(0.5)).cast("long").as("yc"))
    def byUser(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = byUser(Trend.theilSen(evp))
    assert(exact(1L)._1 === 45L, "exact face enumerates all pairs")
    assert(exact(2L)._1 === 3L)
    val capped = byUser(Trend.theilSen(evp, cap = 4))
    // cap binds for user 1: exactly 4*3/2 pairs survive; user 2 is
    // under the cap, so its row is bit-identical to the exact face
    assert(capped(1L)._1 === 6L, s"cap=4 must bound pairs at 6: $capped")
    assert(capped(2L) === exact(2L), "sub-cap entities are untouched")
    // user 1 is exactly linear (100 centi/hour), so EVERY pairwise
    // slope — hence any sample's median — is 100e6 micro
    assert(capped(1L)._2 === 100000000L)
    assert(exact(1L)._2 === 100000000L)
    // determinism: the md5 rank is seeded, not RNG
    assert(byUser(Trend.theilSen(evp, cap = 4)) === capped)
  }
}
