package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketch (the HyperLogLog register construction,
  * Flajolet et al. 2007 — public result), built with the repo's md5 hash
  * family so the REGISTERS themselves are oracle-checkable: Spark's own
  * `approx_count_distinct` and DuckDB's HLL use different hash functions
  * and can never agree, but a register table built from
  * `gramHash64(token)` is plain integer arithmetic both engines compute
  * bit-identically.
  *
  * Register construction over the 60-bit hash h:
  *   bucket = h mod m            (register index)
  *   rest   = h div m            (the remaining 60 − log2(m) bits)
  *   rho    = (60 − log2(m)) − bitlen(rest) + 1, and bitlen(0) ≡ 0
  *            (position of the leftmost 1-bit; all-zero rest saturates)
  * with bitlen computed EXACTLY as `length(bin(rest))` — a binary string
  * has no leading zeros, so its length IS floor(log2)+1, no fp log at
  * the boundary. The register value is max(rho) per bucket.
  *
  * Why emit registers, not an estimate: the m-row register table is the
  * MERGEABLE state — union two corpora's sketches and `max` per bucket
  * (one bounded aggregate) and you have the union's sketch without
  * rescanning either corpus; that is the 100 TB story (per-shard
  * sketches roll up along any hierarchy: file → partition → table).
  * The estimate is a driver-side fold over m rows (see
  * [[estimateFromRegisters]]); SketchSpec checks it against the exact
  * count within HLL's published error envelope.
  *
  * Scale: one codegen scan (explode + hash + mod/div/bin) and ONE
  * m-group aggregate with map-side combine — registers never exceed m
  * rows anywhere in the plan.
  */
object Sketch {

  /** Register table (bucket, r) for the distinct values of `valueCol`
    * (a string column; hashed with the repo-standard md5 prefix).
    * Buckets with no hash landing in them are ABSENT (a dense m-row
    * table would need a spine join; absent ≡ r = 0 by convention and
    * the estimator treats it so).
    */
  def registers(df: DataFrame, valueCol: String, m: Int): DataFrame = {
    require(m >= 2 && (m & (m - 1)) == 0 && m <= 65536,
      s"m=$m must be a power of two in [2, 65536]")
    val spark = df.sparkSession
    val width = 60 - Integer.numberOfTrailingZeros(m) // bits in `rest`
    val h = TextOps.gramHash64(spark, col(valueCol))
    df.select(h.as("h"))
      .select(pmod(col("h"), lit(m.toLong)).as("bucket"),
        expr(s"h div ${m.toLong}").as("rest"))
      .select(col("bucket"),
        when(col("rest") === 0L, lit(width + 1))
          .otherwise(lit(width + 1) - length(bin(col("rest"))))
          .cast("int").as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("r"))
  }

  /** The standard HLL estimate from a (possibly sparse) register list —
    * a driver-side fold over ≤ m values (diagnostic/spec use; the
    * registers are the product).
    */
  def estimateFromRegisters(regs: Seq[(Long, Int)], m: Int): Double = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val present = regs.toMap
    val z = (0 until m).map(b => math.pow(2.0, -present.getOrElse(b.toLong, 0))).sum
    val raw = alpha * m * m / z
    // small-range correction (linear counting) per the published paper
    val zeros = m - present.count(_._2 > 0)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }
}
