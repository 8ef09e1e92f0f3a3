package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.text.{NearDup, TextOps}

/** Ad-hoc perf probe: stage-by-stage timing of the minhash pipeline.
  * Usage: sbt "runMain graft.tools.Probe"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val rows = TextOps.wordShingleRows(Tables.documents(spark, d), "doc_id", "text", 3)
    time("shingle-rows")(rows)
    time("rows+md5")(rows.withColumn("h", md5(col("g"))))
    time("full-pairs")(NearDup.minhashLshPairsFromRows(rows))
    // tokens-only comparison: is the HOF shingle build the bottleneck?
    time("tokens-only")(Tables.documents(spark, d)
      .select(size(TextOps.tokens(col("text"))).as("n")))
    spark.stop()
  }
}
