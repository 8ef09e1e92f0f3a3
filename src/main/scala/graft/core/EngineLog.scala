package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Engine-level run logging — the parity piece for the reference's
  * per-step logging (`logging.config:1-41`, `discharge_obs_pd.py:368-373`).
  * The reference's `logging.config` wires a console `StreamHandler` only
  * (stdout, no file); the size rotation HERE is this repo's own addition
  * — modeled on Python's stdlib `RotatingFileHandler` generally, because
  * a long-lived Spark driver needs bounded log files where a short-lived
  * cron'd script does not. Every Dataset ACTION on the session appends
  * one parseable line
  *
  *   `<iso-ts>\t<action>\t<millis>ms\trows=<n|->\t<root plan node>\tOK|FAIL <error>`
  *
  * to `<dir>/engine.log`, rotated `engine.log` → `.1` → … → `.<maxFiles>`
  * (oldest dropped). Spark's own log4j keeps the executor/stage firehose;
  * this is the per-step job summary an operator reads to see WHAT the
  * pipeline did — the level the reference logs at.
  *
  * Implementation: a `QueryExecutionListener` (the public hook for
  * action-level success/failure with wall duration) — no log4j config
  * shipping, no dependencies; `install` is idempotent per (session, dir)
  * and returns the listener so tests/CLIs can `uninstall` it.
  */
object EngineLog {

  final class Listener private[EngineLog] (dir: Path, maxBytes: Long, maxFiles: Int)
      extends QueryExecutionListener {
    private val file = dir.resolve("engine.log")
    // Lock is keyed on the NORMALIZED DIRECTORY, not this listener:
    // two SparkSessions logging to the same dir each hold their own
    // Listener, and per-instance synchronized would let their writes
    // and rotations interleave (file moved mid-append). dirLock gives
    // every listener on the same directory the same monitor.
    private val lock = dirLock(dir)

    private def rotate(): Unit = {
      if (Files.exists(file) && Files.size(file) >= maxBytes) {
        val last = dir.resolve(s"engine.log.$maxFiles")
        if (Files.exists(last)) Files.delete(last)
        (maxFiles - 1) to 1 by -1 foreach { i =>
          val from = dir.resolve(s"engine.log.$i")
          if (Files.exists(from))
            Files.move(from, dir.resolve(s"engine.log.${i + 1}"))
        }
        Files.move(file, dir.resolve("engine.log.1"))
      }
    }

    private def write(line: String): Unit = lock.synchronized {
      rotate()
      Files.write(file, (line + "\n").getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }

    // DEFENSIVE on purpose: for a failed query, touching qe.executedPlan
    // re-raises the captured analysis/optimization failure inside the
    // listener, and ExecutionListenerBus swallows listener exceptions —
    // the FAIL line would silently never be written (measured: a
    // driver-side constant-folding failure logged nothing).
    private def rows(qe: QueryExecution): String =
      try qe.executedPlan.metrics.get("numOutputRows")
        .map(_.value.toString).getOrElse("-")
      catch { case _: Throwable => "-" }

    private def root(qe: QueryExecution): String =
      try qe.executedPlan.nodeName catch { case _: Throwable => "-" }

    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      write(s"${Instant.now()}\t$funcName\t${durationNs / 1000000}ms\t" +
        s"rows=${rows(qe)}\t${root(qe)}\tOK")

    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit =
      write(s"${Instant.now()}\t$funcName\t-\trows=-\t${root(qe)}\t" +
        s"FAIL ${exception.getClass.getSimpleName}: " +
        // first line only, tabs flattened — a message containing \t must
        // not break the advertised 6-tab-field line format
        Option(exception.getMessage).iterator
          .flatMap(_.linesIterator).take(1).mkString.replace('\t', ' '))
  }

  private val installed =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Listener]

  // One monitor object per normalized directory, shared by every
  // Listener writing there (same-JVM multi-session safety). Never
  // evicted: a handful of log dirs per driver lifetime is bounded.
  private val dirLocks =
    scala.collection.concurrent.TrieMap.empty[String, AnyRef]

  private def dirLock(dir: Path): AnyRef = {
    val key = dir.toAbsolutePath.normalize.toString
    dirLocks.putIfAbsent(key, new AnyRef) match {
      case Some(existing) => existing
      case None           => dirLocks(key)
    }
  }

  /** Idempotent per (session, NORMALIZED dir) — "logs" and "./logs"
    * cannot double-register and race the rotation; 5 MB × 5 files
    * mirrors the reference's handler defaults order-of-magnitude.
    * Entries live until `uninstall` — a long-lived driver cycling many
    * sessions should uninstall on teardown (one-shot CLI mains can
    * skip it: the map dies with the JVM).
    */
  def install(spark: SparkSession, dir: String,
              maxBytes: Long = 5L * 1024 * 1024, maxFiles: Int = 5): Listener = {
    // register only the putIfAbsent WINNER: TrieMap.getOrElseUpdate
    // evaluates its block non-atomically, and a losing concurrent
    // install would leave a second listener registered forever
    // (double lines + racing rotation)
    val p = Paths.get(dir)
    Files.createDirectories(p)
    val candidate = new Listener(p, maxBytes, maxFiles)
    installed.putIfAbsent((spark, norm(dir)), candidate) match {
      case Some(existing) => existing
      case None =>
        spark.listenerManager.register(candidate)
        candidate
    }
  }

  def uninstall(spark: SparkSession, dir: String): Unit =
    installed.remove((spark, norm(dir))).foreach(spark.listenerManager.unregister)

  private def norm(dir: String): String =
    Paths.get(dir).toAbsolutePath.normalize.toString
}
