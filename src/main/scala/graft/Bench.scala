package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs every registered query
  * on SPARK_GRAFT_SF_DIR, prints ONE JSON line.
  *
  * Measurement notes:
  *  - queries are fully materialized via a noop-format write — `count()`
  *    would let Catalyst prune projections and under-measure expression
  *    work (e.g. a pivot's aggregates would never be computed);
  *  - one warm-up query first so JIT/classloading/FS-cache costs don't
  *    land on the first measured query;
  *  - queries run in sorted name order for run-to-run comparability;
  *  - each query runs REPEATS times back to back; `queries` carries the
  *    BEST time and `repeats` carries every raw time. Best-of-N is the
  *    regression detector: wall noise on this box is ±30% run to run
  *    (the r02 q26-q34 "inflation" was exactly that), and the minimum is
  *    the statistic least contaminated by GC/compilation/FS interference.
  *    First-run-only costs (janino compile, shuffle-file warmup) still
  *    show — in the repeats list, where they belong, instead of being
  *    conflated with steady-state throughput.
  *
  * Output contract (r06, tightened r09): stdout carries ONLY the bounded
  * summary line (total + best-of per query + errors), printed as the
  * LAST thing before exit — even if spark.stop() throws. The driver
  * keeps just the final ~2000 chars of stdout, so anything printed after
  * the summary — or any long line sharing stdout with it — evicts it
  * from the capture window: r03 put repeats and summary on one line
  * (truncated), r04 printed summary FIRST and the repeats line pushed it
  * out, and by r07/r08 the summary line ITSELF outgrew the window
  * (118 full-name entries ≈ 3.4 KB) and arrived front-truncated. The
  * stdout line therefore uses short query keys ("q61") and degrades
  * decimal precision — then drops the map — sooner than exceed 1900
  * chars; the full-name/full-precision record goes to stderr and
  * target/bench.json. The OTHER
  * half of the contract lives in build.sbt: with fork:=true, sbt's
  * default LoggedOutput prefixes every forked-stdout line with
  * "[info] ", which kept the line unparseable through r05 —
  * `run / outputStrategy := StdoutOutput` + showSuccess/showTiming off
  * make the summary a BARE final line. The full record (summary +
  * per-repeat times) goes to stderr and to `target/bench.json`, where
  * length doesn't matter.
  *
  * Env knobs (local iteration / diagnostics, unset in driver runs):
  *  - SPARK_GRAFT_BENCH_ONLY=q33,q34  run only the named queries
  *    (prefix match), for tight fix-measure loops;
  *  - SPARK_GRAFT_BENCH_ORDER=reverse run queries in reverse name order —
  *    the order-independence check: per-query best-of-3 should be stable
  *    under reordering unless cross-query session state (codegen cache,
  *    GC pressure) contaminates the numbers.
  */
object Bench {
  val Repeats = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up: JIT, codegen cache, parquet footer reads
    try materialize(SparkEntry.queries("q01_pricing_summary")(spark, sfDir))
    catch { case _: Throwable => () }

    val failed = scala.collection.mutable.ListBuffer.empty[String]
    // a repeat that THROWS must not contribute its (fast-fail) wall time
    // to min/total — a crashing query would read as a phantom speedup in
    // the regression table. Failed repeats become null in `repeats`; a
    // query with zero successful repeats reports best = -1 (unmistakably
    // not a time) and is listed in `errors`.
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
    val ordered =
      if (sys.env.get("SPARK_GRAFT_BENCH_ORDER").contains("reverse")) sorted.reverse
      else sorted
    val selected = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(pats) =>
        val ps = pats.split(",").map(_.trim).filter(_.nonEmpty)
        ordered.filter { case (n, _) => ps.exists(n.startsWith) }
      case None => ordered
    }
    val results = selected.map { case (name, fn) =>
      val times: Seq[Option[Double]] = (1 to Repeats).map { _ =>
        val t0 = System.nanoTime()
        try { materialize(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          if (!failed.contains(name)) {
            failed += name
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
          }
          None
        }
      }
      val ok = times.flatten
      (name, if (ok.nonEmpty) ok.min else -1.0, times)
    }
    // results print in sorted order regardless of RUN order so round-over-
    // round diffs line up
    val out = results.sortBy(_._1)
    val qs = out.map { case (k, best, _) => "\"" + k + "\":" + f"$best%.3f" }
      .mkString("{", ",", "}")
    // stdout line uses SHORT keys ("q61" for "q61_pretraining_pipeline"):
    // at 118 queries the full-name map alone is ~3.4 KB, which overflows
    // the driver's ~2000-char capture window no matter how cleanly the
    // line is printed (r07/r08 benches arrived truncated → unparseable).
    // Short keys are unique by construction (the qNN prefix is the query
    // id) and BASELINE.md documents the mapping; full names stay in
    // target/bench.json and on stderr.
    // Locale.ROOT: %f under a comma-decimal default locale would emit
    // "0,123" and corrupt the one line the driver must json-parse
    def num(prec: Int, v: Double): String =
      String.format(java.util.Locale.ROOT, s"%.${prec}f", Double.box(v))
    def shortQs(prec: Int): String =
      out.map { case (k, best, _) =>
        "\"" + k.takeWhile(_ != '_') + "\":" + num(prec, best)
      }.mkString("{", ",", "}")
    val reps = out.map { case (k, _, ts) =>
      "\"" + k + "\":" + ts.map(_.map(t => f"$t%.3f").getOrElse("null"))
        .mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = out.map(_._2).filter(_ >= 0).sum
    // failures are IN the JSON line, not just stderr — a throwing query
    // must not read as a speedup
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // full-fidelity summary (full names, 3 decimals) — file + stderr only
    val summary =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    // stdout summary: must fit the driver's ~2000-char window WHOLE.
    // 3-decimal short keys ≈ 1.7 KB at 118 queries; degrade precision,
    // then drop the per-query map entirely, before ever printing a line
    // that would be truncated into unparseable garbage.
    def stdoutLine(qsJson: String): String =
      s"""{"metric":"total","value":${num(3, total)},"unit":"sec","queries":$qsJson,"errors":$errs,"sf":"$sfDir"}"""
    val compact = Seq(shortQs(3), shortQs(2), shortQs(1), "{}")
      .map(stdoutLine)
      .find(_.length <= 1900)
      .getOrElse(stdoutLine("{}"))
    val repeats = s"""{"metric":"repeats","repeats":$reps,"sf":"$sfDir"}"""
    // repeats + full-name summary: stderr (diagnostic, unbounded) +
    // durable file copy
    System.err.println(summary)
    System.err.println(repeats)
    try {
      val p = java.nio.file.Paths.get("target", "bench.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p,
        (summary + "\n" + repeats + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write target/bench.json: ${e.getMessage}")
    }
    // summary LAST, alone on stdout: spark.stop() can emit shutdown noise,
    // so even that runs before the one line the driver must see — but a
    // throwing stop() must not take the summary down with it (finally)
    try spark.stop()
    catch { case e: Throwable =>
      System.err.println(s"[bench] spark.stop failed: ${e.getMessage}")
    } finally println(compact)
  }
}
