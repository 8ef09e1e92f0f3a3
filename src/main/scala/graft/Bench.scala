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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
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
    val qs = results.map { case (k, best, _) => "\"" + k + "\":" + f"$best%.3f" }
      .mkString("{", ",", "}")
    val reps = results.map { case (k, _, ts) =>
      "\"" + k + "\":" + ts.map(_.map(t => f"$t%.3f").getOrElse("null"))
        .mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // failures are IN the JSON line, not just stderr — a throwing query
    // must not read as a speedup
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"repeats":$reps,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
