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

  /** COUNT-MIN SKETCH (Cormode & Muthukrishnan 2005 — public result):
    * `d` hash rows × `width` buckets of ADDITIVE counters; an item's
    * estimate is the MINIMUM of its `d` cells and is biased UP only
    * (collisions add, never subtract): est ≤ true + ε·N with
    * ε = e/width at probability 1 − e^−d. Like [[registers]], the
    * PRODUCT is the mergeable state — two shards' sketches SUM cell-wise
    * (one bounded aggregate), so per-shard sketches roll up file →
    * partition → table without rescanning anything; that is the 100 TB
    * story for frequency questions ("how often does this token/URL/
    * fingerprint occur") that exact per-key counts answer only with a
    * corpus-wide shuffle.
    *
    * Hash family: the repo-standard md5-prefix rows (`hashPrefix` with
    * seed `cm<r>|`, oracle rendering
    * `('0x' || substr(md5('cm' || r || '|' || w), 1, 8))::BIGINT`), so
    * the CELLS are oracle-checkable integer arithmetic — the same
    * engine-portability argument as the HLL registers above.
    *
    * Scale shape: ONE pass over the token stream — each token emits its
    * `d` (row, bucket) cells via posexplode of a literal-sized array,
    * and the single shuffle is the ≤ d·width-group aggregate with
    * map-side combine. The sketch never exceeds d·width rows anywhere.
    */
  def countMinSketch(items: DataFrame, valueCol: String, d: Int,
                     width: Int): DataFrame = {
    require(d >= 1 && d <= 8 && width >= 2,
      s"need d in [1, 8] and width >= 2, got d=$d width=$width")
    items.select(posexplode(array((0 until d).map(r =>
        pmod(TextOps.hashPrefix(s"cm$r|", col(valueCol)), lit(width.toLong))): _*))
        .as(Seq("r", "bucket")))
      .groupBy("r", "bucket").agg(count(lit(1)).as("c"))
  }

  /** The count-min MEASUREMENT HARNESS (the q98-Bloom-FP pattern:
    * approximate structures ship with their error measured, not
    * asserted): estimates for the exact top-`k` tokens joined against
    * their true counts — `overcount = est − true ≥ 0` is the published
    * bias in action, per token. One corpus scan feeds the sketch, one
    * feeds the exact counts; the final join touches k·d rows of a
    * ≤ d·width-row sketch (broadcast by size, not by hint).
    */
  def countMinTopK(docs: DataFrame, textCol: String, d: Int = 3,
                   width: Int = 1024, k: Int = 20): DataFrame = {
    val toks = docs.select(explode(TextOps.tokens(col(textCol))).as("tok"))
    val sketch = countMinSketch(toks, "tok", d, width)
    val top = toks.groupBy(col("tok").as("word"))
      .agg(count(lit(1)).as("true_count"))
      .orderBy(col("true_count").desc, col("word")).limit(k)
    top
      .select(col("word"), col("true_count"),
        posexplode(array((0 until d).map(r =>
          pmod(TextOps.hashPrefix(s"cm$r|", col("word")), lit(width.toLong))): _*))
          .as(Seq("r", "bucket")))
      .join(sketch, Seq("r", "bucket"))
      .groupBy("word", "true_count")
      .agg(min(col("c")).as("est_count"))
      .select(col("word"), col("true_count"), col("est_count"),
        (col("est_count") - col("true_count")).as("overcount"))
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
