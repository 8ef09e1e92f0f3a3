package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property tests (SURVEY §5.2). Spark jobs are expensive per-case, so
  * each property runs a bounded number of generated datasets — ScalaCheck
  * generators driven directly with fixed seeds (the scalatest bridge
  * artifact is not in the offline cache).
  */
class PropertySpec extends SparkSpec {

  private val N = 8
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    (1 to N).foreach { i =>
      f(g.pureApply(Gen.Parameters.default.withSize(12), Seed(42L + i)))
    }
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to N).foreach { i =>
      f(g1.pureApply(Gen.Parameters.default.withSize(12), Seed(42L + i)),
        g2.pureApply(Gen.Parameters.default.withSize(12), Seed(142L + i)))
    }
  private def whenever(c: Boolean)(f: => Unit): Unit = if (c) f

  private val cell = for {
    k <- Gen.choose(0, 6)
    v <- Gen.option(Gen.choose(-50.0, 50.0).map(d => math.rint(d * 10) / 10))
  } yield (s"k$k", v)
  private val table = Gen.listOf(cell).map(_.distinctBy(_._1))

  test("combineFirst: old wins on non-null; idempotent; commutes on disjoint nulls") {
    import spark.implicits._
    forAll(table, table) { (a, b) =>
      whenever(a.nonEmpty || b.nonEmpty) {
        val da = a.toDF("k", "value")
        val db = b.toDF("k", "value")
        val once = Merge.combineFirst(da, db, Seq("k"), Seq("value"))
          .as[(String, Option[Double])].collect().toMap
        // law: for every key, result = a(k) if non-null else b(k)
        val am = a.toMap; val bm = b.toMap
        (am.keySet ++ bm.keySet).foreach { k =>
          val expect = am.getOrElse(k, None).orElse(bm.getOrElse(k, None))
          assert(once(k) === expect, s"key $k")
        }
        // idempotence: merging b again changes nothing
        val twice = Merge.combineFirst(once.toSeq.toDF("k", "value"), db,
          Seq("k"), Seq("value")).as[(String, Option[Double])].collect().toMap
        assert(twice === once)
      }
    }
  }

  test("updateWith is combineFirst with sides swapped (J3/J9 duality)") {
    import spark.implicits._
    forAll(table, table) { (a, b) =>
      whenever(a.nonEmpty && b.nonEmpty) {
        val da = a.toDF("k", "value"); val db = b.toDF("k", "value")
        val upd = Merge.updateWith(da, db, Seq("k"), Seq("value"))
          .as[(String, Option[Double])].collect().toMap
        val swapped = Merge.combineFirst(db, da, Seq("k"), Seq("value"))
          .as[(String, Option[Double])].collect().toMap
        assert(upd === swapped)
      }
    }
  }

  test("ffill: never overwrites non-null; fills equal last non-null; monotone run") {
    import spark.implicits._
    val series = Gen.listOf(Gen.option(Gen.choose(0.0, 9.0).map(math.rint)))
      .map(_.zipWithIndex.map { case (v, i) => (i, v) })
    forAll(series) { s =>
      whenever(s.nonEmpty) {
        val df = s.map { case (i, v) => ("k", i, v) }.toDF("k", "ord", "v")
        val out = Fill.ffill(df, Seq("k"), Seq(col("ord")), "v", "f")
          .orderBy("ord").select("f").as[Option[Double]].collect().toSeq
        var last: Option[Double] = None
        s.foreach { case (i, v) =>
          if (v.isDefined) last = v
          assert(out(i) === last, s"pos $i")
        }
      }
    }
  }

  test("pivot/melt round-trip preserves the long table") {
    import spark.implicits._
    val obsGen = Gen.listOf(for {
      st <- Gen.oneOf("s1", "s2", "s3")
      t <- Gen.choose(0, 5)
      v <- Gen.choose(0.0, 99.0).map(math.rint)
    } yield (st, t, v)).map(_.distinctBy(r => (r._1, r._2)))
    forAll(obsGen) { rows =>
      whenever(rows.nonEmpty) {
        val long = rows.toDF("station", "t", "value")
        val stations = Seq("s1", "s2", "s3")
        val wide = long.groupBy("t").pivot("station", stations).agg(first("value"))
        val melted = wide.select(col("t"),
            explode(map(stations.flatMap(s => Seq(lit(s), col(s"`$s`"))): _*))
              .as(Seq("station", "value")))
          .filter(col("value").isNotNull)
          .select("station", "t", "value")
          .as[(String, Int, Double)].collect().toSet
        assert(melted === rows.toSet)
      }
    }
  }

  test("recurrence output is always one of {max, last, null} and starts at max") {
    import spark.implicits._
    val buckets = Gen.listOf(for {
      m <- Gen.option(Gen.choose(0.0, 9.0).map(math.rint))
      l <- Gen.option(Gen.choose(0.0, 9.0).map(math.rint))
    } yield (m, l))
    forAll(buckets) { bs =>
      whenever(bs.nonEmpty) {
        val df = bs.zipWithIndex.map { case ((m, l), i) =>
          ("k", java.sql.Timestamp.valueOf(f"2023-01-01 ${i % 24}%02d:00:00"), m, l)
        }.toDF("k", "bucket", "maxV", "lastV")
        val out = Recurrence.risingFalling(spark, df, "k", "bucket", "maxV", "lastV")
          .orderBy("bucket").select("h").collect()
          .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
        out.zip(bs).zipWithIndex.foreach { case ((h, (m, l)), i) =>
          assert(h === m || h === l, s"pos $i: $h not in {$m, $l}")
          if (i == 0) assert(h === m, "first bucket must take max")
        }
      }
    }
  }

  private val vec = Gen.choose(1, 24).flatMap(n =>
    Gen.listOfN(n, Gen.choose(-10.0, 10.0).map(d => math.rint(d * 100) / 100)))

  test("DoubleArrayDot == aggregate(zip_with) fold, bit-for-bit") {
    import spark.implicits._
    forAll(vec, vec) { (a0, b0) =>
      val n = math.min(a0.length, b0.length)
      val (a, b) = (a0.take(n), b0.take(n))
      val df = Seq((a, b)).toDF("a", "b")
      val hof = aggregate(zip_with($"a", $"b", (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      val out = df.select(
          graft.plans.ArrayOps.doubleDot(spark, $"a", $"b").as("k"),
          hof.as("h"))
        .as[(Double, Double)].head()
      assert(java.lang.Double.doubleToLongBits(out._1) ===
        java.lang.Double.doubleToLongBits(out._2))
    }
  }

  test("DoubleMatVec row j == DoubleArrayDot against row j's literal") {
    import spark.implicits._
    forAll(vec) { v =>
      val dims = v.length
      val mat = Array.tabulate(3, dims)((j, i) => (j + 1) * 0.5 - i * 0.25)
      val df = Seq(Tuple1(v)).toDF("v")
      val mv = df.select(graft.plans.ArrayOps.matVec(spark, $"v", mat,
        s"prop_3x$dims").as("m")).as[Seq[Double]].head()
      val dots = (0 until 3).map { j =>
        df.select(graft.plans.ArrayOps.doubleDot(spark, $"v",
          typedlit(mat(j).toSeq)).as("d")).as[Double].head()
      }
      assert(mv.map(java.lang.Double.doubleToLongBits) ===
        dots.map(java.lang.Double.doubleToLongBits))
    }
  }

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "x1", "y2")
  private val doc = Gen.choose(0, 9).flatMap(n => Gen.listOfN(n, word))
    .map(_.mkString(" "))
  private val corpusGen = Gen.choose(2, 10).flatMap(n => Gen.listOfN(n, doc))
    .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  test("repetitionSignals invariants: distinct <= total; top bigram count bounded") {
    import spark.implicits._
    forAll(corpusGen) { docs =>
      val out = graft.text.Terms.repetitionSignals(
          docs.toDF("doc_id", "text"), "doc_id", "text")
        .as[(Long, Int, Int, String, Long)].collect()
      assert(out.length === docs.length)
      out.foreach { case (_, nTok, nDist, bigram, cnt) =>
        assert(nDist <= nTok && nDist >= (if (nTok > 0) 1 else 0))
        if (nTok >= 2) assert(cnt >= 1 && cnt <= nTok - 1 && bigram.nonEmpty)
        else assert(cnt === 0 && bigram === "")
      }
    }
  }

  test("sequencePacking invariants: per-shard offsets tile the token stream exactly") {
    import spark.implicits._
    forAll(corpusGen) { docs =>
      val df = docs.toDF("doc_id", "text")
        .withColumn("shard", (col("doc_id") % 2).cast("string"))
      val out = graft.text.Terms.sequencePacking(df, "doc_id", "text",
          "shard", blockTokens = 4)
        .as[(Long, String, Long, Long, Long)].collect()
      out.groupBy(_._2).foreach { case (_, rows) =>
        val sorted = rows.sortBy(_._1)
        // offsets are the exclusive prefix sums of token counts, in id order
        var expect = 0L
        sorted.foreach { case (_, _, n, start, chunk) =>
          assert(start === expect)
          assert(chunk === start / 4)
          expect += n
        }
      }
    }
  }

  test("incrementalDedup verdicts partition the batch; match ids come from the corpus") {
    import spark.implicits._
    forAll(corpusGen) { docs =>
      whenever(docs.length >= 4) {
        val all = docs.toDF("doc_id", "text")
        val corpus = all.filter(col("doc_id") % 2 === 0)
        val batch = all.filter(col("doc_id") % 2 === 1)
        val out = graft.text.NearDup.incrementalDedup(corpus, batch,
            "doc_id", "text", minJaccard = 0.5)
          .as[(Long, String, Option[Long], Option[Double])].collect()
        val batchIds = docs.map(_._1).filter(_ % 2 == 1).toSet
        assert(out.map(_._1).toSet === batchIds)       // one verdict per batch doc
        out.foreach { case (_, verdict, matchId, j) =>
          assert(Set("exact", "near", "new").contains(verdict))
          if (verdict == "new") assert(matchId.isEmpty && j.isEmpty)
          else {
            assert(matchId.exists(_ % 2 == 0), "match must be a corpus doc")
            if (verdict == "exact") assert(j === Some(1.0))
            else assert(j.exists(v => v >= 0.5 && v <= 1.0))
          }
        }
      }
    }
  }
}
