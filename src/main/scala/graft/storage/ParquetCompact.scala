package graft.storage

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.Path

/** Small-file compaction for APPEND-GROWN parquet directories — the
  * `_bands`/`_fpbands` corpus-index arm of VERDICT r14 #3 (the
  * bucketed IVF-PQ table has its own bucket-preserving rewrite,
  * [[graft.tools.IvfPqBuild.compact]]). Every ingest tick appends a
  * handful of files; a thousand ticks is thousands of files under
  * every later scan and listing, so a deployment runs this on a slower
  * cadence than the ticks (or whenever [[dataFiles]] crosses its
  * threshold).
  *
  * Contract: single-writer (the same process discipline the ticks
  * already assume — the swap is delete-then-rename, not atomic under
  * concurrent readers); row-level content is IDENTICAL before and
  * after (spec-pinned), only the file layout changes. Rewrite cost is
  * one read + one shuffle-free coalesce write of the directory — the
  * honest price of un-fragmenting, paid 1/cadence as often as ticks.
  */
object ParquetCompact {

  /** Data-file census of a parquet directory (underscore-prefixed
    * commit markers excluded). 0 when the directory does not exist. */
  def dataFiles(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0
    else fs.listStatus(p)
      .count(f => f.isFile && !f.getPath.getName.startsWith("_")
        && !f.getPath.getName.startsWith("."))
  }

  /** Rewrite `dir` into ~`targetFiles` files when its census exceeds
    * `maxFiles`; returns (filesBefore, filesAfter) — equal when the
    * threshold did not bind. The rewrite lands beside the directory
    * (`<dir>__compact`) and swaps in via delete + rename, so a crash
    * before the swap leaves the original untouched and a crash between
    * delete and rename is recoverable from the __compact copy. */
  def compactDir(spark: SparkSession, dir: String, maxFiles: Int,
                 targetFiles: Int = 1): (Int, Int) = {
    require(targetFiles >= 1, s"targetFiles $targetFiles < 1")
    val before = dataFiles(spark, dir)
    if (before <= maxFiles) (before, before)
    else {
      val p = new Path(dir)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val tmp = new Path(dir + "__compact")
      fs.delete(tmp, true)
      spark.read.parquet(dir)
        .coalesce(targetFiles)
        .write.mode("overwrite").parquet(tmp.toString)
      fs.delete(p, true)
      require(fs.rename(tmp, p),
        s"compaction swap failed: $tmp -> $p (original deleted; " +
          "recover by renaming the __compact directory by hand)")
      (before, dataFiles(spark, dir))
    }
  }

  /** CLI: runMain graft.storage.ParquetCompact <dir> [maxFiles=64]
    * [targetFiles=1] */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ParquetCompact <dir> [maxFiles] [targetFiles]")
    val spark = graft.tools.ToolSession.local()
    val (before, after) = compactDir(spark, args(0),
      maxFiles = if (args.length > 1) args(1).toInt else 64,
      targetFiles = if (args.length > 2) args(2).toInt else 1)
    println(s"[compact] ${args(0)}: $before -> $after data files" +
      (if (before == after) " (threshold not crossed, no rewrite)" else ""))
    spark.stop()
  }
}
