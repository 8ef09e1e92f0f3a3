package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: a Spark builder over a scale-factor directory plus
  * (when SQL-expressible) an equivalent DuckDB oracle SQL on the same parquet
  * tables. Column names/aliases MUST match between the two — the driver
  * sorts columns by name and hash-compares values.
  *
  * Determinism rules applied throughout the packs:
  *  - no raw timestamps in outputs (ns-vs-µs precision + tz rendering
  *    differences between engines) — always strftime'd strings or epoch ints;
  *  - order-dependent double aggregates (sum/avg over shuffled data) are
  *    rounded at the output boundary so both engines' fp accumulation
  *    orders land on the same value;
  *  - every window/rank ordering is a TOTAL order (tie-broken by a unique id).
  */
case class Q(build: (SparkSession, String) => DataFrame, oracle: Option[String])

trait QueryPack {
  def queries: Map[String, Q]
}
