package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet tables (TESTDATA.md).
  *
  * One function per table so query code never hard-codes paths; `dir` is the
  * scale-factor directory (e.g. /root/testdata/sf0.01). All reads are plain
  * parquet scans — Catalyst pushes projections/filters into the scan, so no
  * manual column selection is needed here.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = read(s, d, "lineitem")
  /** `events.ts` has shipped in two parquet encodings across testdata
    * generations: TIMESTAMP(NANOS) — which Spark's vectorized reader
    * rejects, so it is read nanos-as-long and floored to microseconds
    * (pmod-based FLOOR — `div` truncates toward zero, which disagrees with
    * DuckDB's epoch_us for pre-1970 sub-microsecond timestamps) — and
    * plain TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark reads as
    * TIMESTAMP_NTZ. Both normalize to the same downstream contract:
    * session-UTC TimestampType with microsecond values, so every query and
    * oracle sees identical wall-clock instants regardless of encoding.
    * The dispatch is on the READ schema, not the path, so mixed-generation
    * directories still load.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case org.apache.spark.sql.types.TimestampNTZType =>
        // the session timezone is pinned to UTC everywhere
        // (Verify/Bench/specs), so the NTZ→TZ cast is value-preserving
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case other =>
        // a FOURTH encoding (string? int32 days?) must fail loudly here,
        // not silently cast-to-null through every downstream events query
        throw new IllegalStateException(
          s"events.ts arrived as unsupported type $other — " +
            "extend Tables.events with an explicit, value-checked branch")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
