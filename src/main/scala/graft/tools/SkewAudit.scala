package graft.tools

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** AQE SKEW AUDIT (VERDICT r13 #5): run a registered query and measure
  * whether its shuffles actually skew at scale — per-stage task-time
  * and shuffle-read distributions from a task-metrics listener, plus
  * the executed plan's AQE markers (`AQEShuffleRead` modes; a skew-join
  * split shows as a `skewed` read mode) — instead of arguing from the
  * key distribution. The three named Zipf-headed (group, term) shuffles
  * (q97/q132/q150) are the motivating set: their head terms are
  * massively hot as ROWS, but partial (map-side) aggregation compresses
  * multiplicity before every exchange, so the reducer-side question is
  * whether any stage's max/median task spread says otherwise. AQE's
  * OptimizeSkewedJoin only ever splits SORT-MERGE JOIN partitions — an
  * aggregation-only shuffle cannot engage it BY DESIGN, so a skewed agg
  * would need salting/two-level pre-aggregation in the plan itself;
  * this tool is how we know whether that work is needed.
  *
  * Usage: runMain graft.tools.SkewAudit <sfDir> <q97,q132,q150>
  * Prints one block per query: top stages by max task time with
  * (tasks, median/max ms, median/max shuffle-read) and the plan's
  * AQEShuffleRead census.
  */
object SkewAudit {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SkewAudit <sfDir> <namePrefixes,comma>")
    val dir = args(0)
    val prefixes = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = ToolSession.local()
    prefixes.foreach { p =>
      val (name, fn) = graft.SparkEntry.queries.toSeq.sortBy(_._1)
        .find(_._1.startsWith(p))
        .getOrElse(sys.error(s"no registered query matches '$p'"))
      // (stageId -> (runtimeMs, shuffleReadBytes) per task)
      val byStage = TrieMap.empty[Int, ArrayBuffer[(Long, Long)]]
      val stageName = TrieMap.empty[Int, String]
      val listener = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            val buf = byStage.getOrElseUpdate(t.stageId, ArrayBuffer.empty)
            buf.synchronized {
              buf += ((m.executorRunTime,
                m.shuffleReadMetrics.totalBytesRead))
            }
          }
        }
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
          // the name's callsite half identifies RE-RUN lineages: the
          // same operator line showing up under several stage ids is
          // the multi-consumer recompute smell (the q97 find)
          stageName.put(s.stageInfo.stageId,
            s.stageInfo.name.takeWhile(_ != '\n').take(60))
      }
      spark.sparkContext.addSparkListener(listener)
      // query CONSTRUCTION runs inside the timer: sized dispatches and
      // eager barriers (count()/localCheckpoint at build time) are part
      // of the query's cost — the Bench harness times them, so this
      // tool must too
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      // the action must bind to THIS QueryExecution — a DataFrameWriter
      // builds its own QE (and Dataset.rdd/foreach a deserializing one),
      // leaving df.queryExecution's adaptive plan un-finalized and the
      // census reading the pre-execution shape
      df.queryExecution.executedPlan.execute().foreach(_ => ())
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      if (sys.env.contains("SPARK_GRAFT_SCALE_DIAG"))
        System.err.println(s"[skew-plan] $name:\n$plan")
      val reads = "AQEShuffleRead ([a-z]+)".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      println(s"[skew] $name wall ${f"$wall%.1f"} s; AQEShuffleRead modes: " +
        (if (reads.isEmpty) "none" else reads.map { case (k, v) => s"$k×$v" }
          .mkString(", ")) +
        (if (plan.contains("skewed")) "  ** SKEW-SPLIT ENGAGED **" else ""))
      def med(xs: Seq[Long]): Long =
        if (xs.isEmpty) 0L else xs.sorted.apply(xs.size / 2)
      byStage.toSeq
        .map { case (sid, buf) =>
          val ts = buf.map(_._1).toSeq
          val rs = buf.map(_._2).toSeq
          (sid, ts.size, med(ts), ts.max, med(rs), rs.max)
        }
        .sortBy(-_._4).take(5)
        .foreach { case (sid, n, medT, maxT, medR, maxR) =>
          val skew = if (medT > 0) f"${maxT.toDouble / medT}%.1f" else "inf"
          println(f"[skew]   stage $sid%4d: $n%4d tasks, task ms med=$medT%6d " +
            f"max=$maxT%6d (×$skew), shuffle-read med=${medR / 1024}%8d KiB " +
            f"max=${maxR / 1024}%8d KiB  ${stageName.getOrElse(sid, "")}")
        }
    }
    spark.stop()
  }
}
