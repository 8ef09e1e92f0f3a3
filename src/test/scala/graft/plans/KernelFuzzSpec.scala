package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Fuzz the two newest codegen kernels against their reference forms —
  * the same discipline as the Excel/Y4M codec fuzz suites: a kernel
  * whose doGenCode and nullSafeEval can drift is a kernel whose bench
  * path and spec path silently test different code.
  */
class KernelFuzzSpec extends SparkSpec {

  private val N = 10
  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default.withSize(14), Seed(seed))

  private def matGen(rows: Int, dims: Int): Gen[Array[Array[Double]]] =
    Gen.listOfN(rows, Gen.listOfN(dims, Gen.choose(-2.0, 2.0))).map(
      _.map(_.toArray).toArray)

  test("argmax kernel matches the composed rounded-cosine argmax, ties included") {
    import spark.implicits._
    (1 to N).foreach { trial =>
      val dims = 2 + trial % 5
      val rows = 2 + trial % 4
      val mat0 = sample(matGen(rows, dims), 1000L + trial)
      // force a TIE family: duplicate the first centroid at the end, so
      // the rounded cosines collide and only first-index tie-break agrees
      val mat = mat0 :+ mat0(0).clone()
      val vecs = (1 to 8).map { i =>
        (i.toLong, sample(Gen.listOfN(dims, Gen.choose(-2.0, 2.0)), 7700L + 31L * trial + i).toArray)
      }
      val df = vecs.toDF("id", "v")
      val out = df.select($"id",
          ArrayOps.matVecArgMaxCos(spark, $"v", mat, s"fuzz${trial}").as("cdx"))
        .select($"id", $"cdx",
          element_at($"cdx", mat.length + 1).cast("int").as("cell"))
        .as[(Long, Seq[Double], Int)].collect()
      val kernel = out.map(r => r._1 -> r._3).toMap
      // reference: the original pruning-hostile composition, evaluated
      // with every intermediate kept as a column (its safe regime)
      val cnorms = mat.map(r => math.sqrt(r.map(x => x * x).sum))
      val refDf = df
        .withColumn("vn", sqrt(ArrayOps.doubleDot(spark, $"v", $"v")))
        .withColumn("cd", ArrayOps.matVec(spark, $"v", mat, s"fuzzref$trial"))
        .withColumn("ccos", array(mat.indices.map { c =>
          round(element_at($"cd", c + 1) / (lit(cnorms(c)) * $"vn"), 6)
        }: _*))
        .select($"id", $"cd",
          (array_position($"ccos", array_max($"ccos")) - 1).cast("int").as("cell"))
        .as[(Long, Seq[Double], Int)].collect()
      val composed = refDf.map(r => r._1 -> r._3).toMap
      assert(kernel === composed, s"trial $trial (dims=$dims rows=${mat.length})")
      // the dot prefix must equal matVec bit for bit
      val cdById = refDf.map(r => r._1 -> r._2).toMap
      out.foreach { case (id, cdx, _) =>
        assert(cdx.dropRight(1) === cdById(id), s"trial $trial id $id dots differ")
      }
      assert(!kernel.values.exists(_ == mat.length - 1),
        s"trial $trial: duplicate centroid won a tie it must lose")
    }
    // degenerate matrix: a zero-norm centroid yields NaN cosine. The
    // COMPOSED form cannot even evaluate this under Spark 4's default
    // ANSI mode (double divide-by-zero throws), so the kernel pins its
    // own documented contract instead: NaN ranks greatest (Spark's
    // ordering) and the FIRST NaN cell wins.
    locally {
      val mat = Array(Array(1.0, 0.0), Array(0.0, 0.0), Array(0.0, 1.0))
      val cells = Seq((1L, Array(0.7, 0.7)), (2L, Array(-1.0, 0.5)))
        .toDF("id", "v")
        .select(element_at(
          ArrayOps.matVecArgMaxCos(spark, $"v", mat, "fuzzzero"), 4)
          .cast("int"))
        .as[Int].collect().toSet
      assert(cells === Set(1), "zero-norm centroid (NaN, ranks greatest) must win")
    }
  }

  test("md5-prefix kernel matches the conv(substring(md5)) composition, both halves") {
    import spark.implicits._
    val strGen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.const('é'),
      1 -> Gen.const('中'))).map(_.mkString)
    val strs = (1 to 40).map(i => (i.toLong, sample(strGen, 9000L + i)))
    val df = strs.toDF("id", "g")
    val out = df.select($"id",
        ArrayOps.md5Prefix64(spark, $"g").as("k1"),
        ArrayOps.md5Prefix64(spark, $"g", 17).as("k2"),
        conv(substring(md5($"g"), 1, 15), 16, 10).cast("long").as("c1"),
        conv(substring(md5($"g"), 17, 15), 16, 10).cast("long").as("c2"))
      .as[(Long, Long, Long, Long, Long)].collect()
    out.foreach { case (id, k1, k2, c1, c2) =>
      assert(k1 === c1 && k2 === c2, s"id $id: kernel diverged from composition")
    }
    // interpreted eval parity too (the df path above is codegen)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val k1ById = out.map(r => r._1 -> r._2).toMap
    strs.take(10).foreach { case (id, s) =>
      assert(Md5Prefix64(Literal(s)).eval(null) === k1ById(id),
        s"eval/codegen divergence for ${s.take(20)}")
    }
  }

  test("token-count kernel matches size(array_remove(split)) on adversarial strings") {
    import spark.implicits._
    val tokGen: Gen[String] = Gen.listOf(Gen.oneOf(
      Gen.const(" "), Gen.const("  "), Gen.alphaNumStr.map(_.take(5)),
      Gen.const("日本語"), Gen.const("a b"), Gen.const("\tx"),
      Gen.const(" "), Gen.const("é"))).map(_.mkString)
    val strings = (1 to 60).map(i => sample(tokGen, 4200L + i)) ++
      Seq("", " ", "   ", "a", " a", "a ", " a ", "a  b", "\t", "a\tb",
          "日 本  語", "é  è")
    val df = strings.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val rows = df.select($"id",
        ArrayOps.tokenCount(spark, $"s").as("k"),
        size(array_remove(split($"s", " +"), "")).as("c"))
      .as[(Long, Int, Int)].collect()
    rows.foreach { case (id, k, c) =>
      assert(k === c, s"id=$id string=${strings(id.toInt)}")
    }
    // null in, null out — same as size() over the composed form
    val nulls = Seq((1L, null: String)).toDF("id", "s")
      .select(ArrayOps.tokenCount(spark, $"s").as("k")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("quant-stats kernel: codegen path equals interpreted eval on random arrays") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    (1 to N).foreach { trial =>
      val n = 1 + trial % 7
      val base = sample(Gen.listOfN(n, Gen.choose(-3.0, 3.0)), 500L + trial).toArray
      // alternate between random, constant, and negative-heavy arrays
      val arr = trial % 3 match {
        case 0 => base
        case 1 => Array.fill(n)(base(0))
        case _ => base.map(x => -math.abs(x))
      }
      val levels = Seq(2, 16, 256)(trial % 3)
      val viaDf = Seq((1L, arr)).toDF("id", "v")
        .select(ArrayOps.quantStats(spark, $"v", levels).as("qs"))
        .as[Seq[Double]].head()
      val viaEval = DoubleArrayQuantStats(
        Literal.create(arr, ArrayType(DoubleType, false)), levels)
        .eval(null).asInstanceOf[ArrayData].toDoubleArray().toSeq
      assert(viaDf === viaEval, s"trial $trial levels=$levels arr=${arr.toSeq}")
      assert(viaEval(2) >= 0.0 && viaEval(0) <= viaEval(1))
      if (trial % 3 == 1) assert(viaEval(2) === 0.0) // constant vector
    }
  }

  test("cdc-boundaries kernel matches the filter(sequence, md5-lambda) composition") {
    import spark.implicits._
    // adversarial strings: repeats (every window identical), short docs
    // (< window), exact-window docs, non-ASCII (char-positioned path),
    // and random word soup
    val strings = Seq(
      "", "ab", "aaaaaaaaaa", "abcdefgh", "abcdefghi",
      "aaaaaaaabbbbbbbbaaaaaaaa",
      "naïve ünicode blåbær grüß æøå é" * 3,
      (1 to 40).map(i => s"w${i % 7}").mkString(" "),
      "key agg row scan slow fast table value part hash " * 5)
    (Seq(2, 3) zip Seq(8, 4)).foreach { case (modBits, window) =>
      val m = 1L << modBits
      val df = strings.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "t")
      val out = df.select($"id",
          ArrayOps.cdcBoundaries(spark, $"t", window, modBits).as("k"),
          when(length($"t") < window, array().cast("array<int>"))
            .otherwise(filter(sequence(lit(window), length($"t")),
              i => pmod(conv(substring(md5($"t".substr(
                i - lit(window - 1), lit(window))), 1, 8), 16, 10)
                .cast("long"), lit(m)) === 0L)).as("c"))
        .as[(Long, Seq[Int], Seq[Int])].collect()
      out.foreach { case (id, k, c) =>
        assert(k === c, s"id=$id window=$window modBits=$modBits " +
          s"string=${strings(id.toInt).take(40)}")
      }
      // at least one case must produce a non-empty boundary list, or the
      // comparison is vacuous
      assert(out.exists(_._2.nonEmpty), s"all-empty at modBits=$modBits")
    }
    val nl = Seq((1L, null: String)).toDF("id", "t")
      .select(ArrayOps.cdcBoundaries(spark, $"t", 8, 5)).collect()
    assert(nl.head.isNullAt(0))
  }

  test("pq-encode kernel matches an independent reference: codes, snapped SSE, residuals, ties (r15)") {
    import spark.implicits._
    (1 to N).foreach { trial =>
      val m = 1 + trial % 3
      val ksub = 2 + trial % 4
      val dsub = 2 + trial % 3
      val dims = m * dsub
      val cb0 = Array.tabulate(m, ksub - 1)((s, c) =>
        sample(Gen.listOfN(dsub, Gen.choose(-2.0, 2.0)),
          900L + 17L * trial + 31L * s + c).toArray)
      // force a TIE family: the last code of every subspace duplicates
      // code 0, so equal snapped SSEs must resolve to the LOWER code
      val cb = cb0.map(row => row :+ row(0).clone())
      val base = sample(Gen.listOfN(dims, Gen.choose(-1.0, 1.0)),
        5500L + trial).toArray
      val vecs = (1 to 8).map { i =>
        (i.toLong, sample(Gen.listOfN(dims, Gen.choose(-2.0, 2.0)),
          7100L + 41L * trial + i).toArray)
      }
      val df = vecs.toDF("id", "v")
      val out = df.select($"id", explode(ArrayOps.pqEncode(spark, $"v",
          typedLit(base.toSeq), m, ksub, cb, s"pqfuzz$trial")).as("p"))
        .select($"id", $"p.subspace", $"p.code", $"p.sse_micro", $"p.rsub")
        .as[(Long, Int, Int, Long, Seq[Double])].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
      // independent reference: plain-Scala folds in the documented order
      def seqDot(a: Array[Double], b: Array[Double]): Double = {
        var acc = 0.0; var i = 0
        while (i < math.min(a.length, b.length)) { acc += a(i) * b(i); i += 1 }
        acc
      }
      vecs.foreach { case (id, v) =>
        for (s <- 0 until m) {
          val r = Array.tabulate(dsub)(i => v(s * dsub + i) - base(s * dsub + i))
          val aa = seqDot(r, r)
          val scored = (0 until ksub).map { c =>
            val sse = (aa - 2.0 * seqDot(r, cb(s)(c))) + seqDot(cb(s)(c), cb(s)(c))
            (math.floor(sse * 1e6 + 0.5).toLong, c)
          }
          val (bestSse, bestCode) = scored.min // (sse, code) lexicographic = lowest code on ties
          val (kc, ks2, kr) = out((id, s))
          assert(kc === bestCode && ks2 === bestSse,
            s"trial $trial id $id s $s: kernel ($kc, $ks2) vs ref ($bestCode, $bestSse)")
          assert(kr === r.toSeq, s"trial $trial id $id s $s residual differs")
          // the duplicated last code NEVER wins (tie resolves down)
          assert(kc < ksub - 1 || scored(ksub - 1)._1 != bestSse || bestCode < ksub - 1)
        }
      }
      // short input fails loudly, never silently truncates
      val e = intercept[Exception] {
        Seq((1L, Array.fill(dims - 1)(0.5))).toDF("id", "v")
          .select(explode(ArrayOps.pqEncode(spark, $"v", typedLit(base.toSeq),
            m, ksub, cb, s"pqfuzzshort$trial"))).count()
      }
      assert(e.getMessage != null)
    }
  }

  test("rle-counts kernels match the explode + groupBy composition (r15)") {
    import spark.implicits._
    // alphabet deliberately tiny (repeat-heavy) and multi-byte: 'é' is
    // 2 UTF-8 bytes, '日' is 3 — the char-gram kernel must slice by
    // CODEPOINT exactly like Spark's substr, which the composed
    // reference uses
    val alpha = Gen.oneOf("a", "b", " ", "é", "日")
    (1 to N).foreach { trial =>
      val n = 2 + trial % 3
      val texts = (1 to 12).map { i =>
        val len = (trial * 7 + i * 3) % 12 // includes lengths < n
        (i.toLong,
          sample(Gen.listOfN(len, alpha), 300L + 13L * trial + i).mkString)
      }
      val df = texts.toDF("id", "t")
      val kernel = df.select($"id",
          explode(ArrayOps.charNgramRleCounts(spark, $"t", n)).as("tc"))
        .select($"id", $"tc.term", $"tc.c")
        .as[(Long, String, Long)].collect().toSet
      val composed = df.select($"id",
          explode(graft.text.TextOps.charNgrams($"t", n)).as("term"))
        .groupBy($"id", $"term").agg(count(lit(1)).as("c"))
        .as[(Long, String, Long)].collect().toSet
      assert(kernel === composed, s"trial $trial n=$n char-gram counts differ")
      // per-row output is SORTED by term (canonical across recomputes)
      val arrs = df.select(ArrayOps.charNgramRleCounts(spark, $"t", n)
          .getField("term").as("ts")).as[Seq[String]].collect()
      arrs.foreach(ts => assert(ts === ts.sorted, s"trial $trial unsorted"))

      // width-prefixed variant (r16, the mixed-width feature union):
      // identical pairs with every term carrying the "n|" namespace
      val prefixed = df.select($"id",
          explode(ArrayOps.charNgramRleCounts(spark, $"t", n,
            widthPrefixed = true)).as("tc"))
        .select($"id", $"tc.term", $"tc.c")
        .as[(Long, String, Long)].collect().toSet
      assert(prefixed === kernel.map { case (id, t, c) => (id, s"$n|$t", c) },
        s"trial $trial n=$n width-prefixed counts differ")

      // the array<string> twin vs the same composition over tokens
      val kernelTok = df.select($"id",
          explode(ArrayOps.stringRleCounts(spark,
            graft.text.TextOps.tokens($"t"))).as("tc"))
        .select($"id", $"tc.term", $"tc.c")
        .as[(Long, String, Long)].collect().toSet
      val composedTok = df.select($"id",
          explode(graft.text.TextOps.tokens($"t")).as("term"))
        .groupBy($"id", $"term").agg(count(lit(1)).as("c"))
        .as[(Long, String, Long)].collect().toSet
      assert(kernelTok === composedTok, s"trial $trial token counts differ")
    }
    // null ELEMENT fails loudly (a silent null group would shift the NB
    // smoothing V count); null INPUT is null-safe → explode drops the row
    val e = intercept[Exception] {
      Seq(1L).toDF("id")
        .select(explode(ArrayOps.stringRleCounts(spark,
          array(lit("a"), lit(null.asInstanceOf[String]))))).count()
    }
    // pin the ACTUAL loud-failure path (ADVICE r15): the kernel's
    // "null term element" require must be the failure, not some
    // analysis/codegen error that would also satisfy a bare intercept;
    // Spark wraps task failures, so walk the cause chain
    val chainMsgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(chainMsgs.contains("rle_counts: null term element"),
      s"expected the kernel's null-term require, got: $chainMsgs")
    assert(Seq((1L, null.asInstanceOf[String])).toDF("id", "t")
      .select(explode(ArrayOps.charNgramRleCounts(spark, $"t", 3)))
      .count() === 0L)
  }

  test("banded levenshtein kernel: equals full DP below threshold, -1 above") {
    import spark.implicits._
    // independent full-matrix reference DP (no band, no early exit)
    def fullLev(a: String, b: String): Int = {
      val prev = Array.tabulate(b.length + 1)(identity)
      val curr = new Array[Int](b.length + 1)
      for (i <- 1 to a.length) {
        curr(0) = i
        for (j <- 1 to b.length) {
          val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
          curr(j) = math.min(math.min(prev(j) + 1, curr(j - 1) + 1),
            prev(j - 1) + cost)
        }
        Array.copy(curr, 0, prev, 0, b.length + 1)
      }
      prev(b.length)
    }
    val alpha = Gen.oneOf("ab".toSeq) // tiny alphabet → distances cluster
    def strGen(n: Int) = Gen.listOfN(n, alpha).map(_.mkString)
    val cases = (1 to 60).map { trial =>
      val la = trial % 13
      val lb = (trial * 7) % 17
      val a = sample(strGen(la), 900L + trial)
      // half the trials mutate a (small true distance), half independent
      val b = if (trial % 2 == 0) sample(strGen(lb), 1700L + trial)
        else a.take(math.max(0, la - trial % 3)) + sample(strGen(trial % 4), 41L * trial)
      val k = trial % 9 // thresholds straddle the true distances
      (trial.toLong, a, b, k)
    }
    val out = cases.toDF("id", "a", "b", "k")
      .select($"id", ArrayOps.levenshteinWithin(spark, $"a", $"b", $"k").as("lev"),
        // the builtin (codepoint-based; ASCII here) as a second reference
        levenshtein($"a", $"b").as("ref"))
      .as[(Long, Int, Int)].collect().toSeq
    val byId = cases.map(c => c._1 -> c).toMap
    out.foreach { case (id, lev, sparkRef) =>
      val (_, a, b, k) = byId(id)
      val expect = fullLev(a, b)
      assert(sparkRef === expect, s"reference DP drifted: id=$id a=$a b=$b")
      if (expect <= k) assert(lev === expect, s"id=$id a=$a b=$b k=$k")
      else assert(lev === -1, s"id=$id a=$a b=$b k=$k expect=$expect")
    }
    // negative threshold and empty-side edges
    val edges = Seq((1L, "", "", 0), (2L, "", "abc", 2), (3L, "", "abc", 3),
        (4L, "abcd", "", -1))
      .toDF("id", "a", "b", "k")
      .select($"id", ArrayOps.levenshteinWithin(spark, $"a", $"b", $"k").as("lev"))
      .as[(Long, Int)].collect().toMap
    assert(edges === Map(1L -> 0, 2L -> -1, 3L -> 3, 4L -> -1))
    // null in, null out
    val nl = Seq((1L, null: String, "x", 5)).toDF("id", "a", "b", "k")
      .select(ArrayOps.levenshteinWithin(spark, $"a", $"b", $"k")).collect()
    assert(nl.head.isNullAt(0))
  }
}
