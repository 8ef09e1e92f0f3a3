package graft.tools

import org.apache.spark.sql.SparkSession

/** The ONE local-session builder for graft/tools mains — three CLIs had
  * copy-pasted the same 9 lines and had already drifted on the
  * SPARK_GRAFT_CPUS default; a new required config now lands once.
  */
object ToolSession {
  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // spill-safe large shuffles: AQE starts at 512 partitions and
      // coalesces small stages to the advisory size (the Bench session's
      // r13 setting — see the scaladoc there for the ×1000 OOM it fixes)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // engine-level per-action summary log (reference logging parity —
    // see EngineLog): opt-in via env so bench/verify stdout contracts
    // and driver runs are unaffected
    sys.env.get("GRAFT_LOG_DIR").foreach(graft.core.EngineLog.install(spark, _))
    spark
  }
}
