package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter decontamination gate (Bloom 1970; the production answer to
  * "is this corpus n-gram in the benchmark set" at scales where even the
  * sizedSemiJoin fallback hurts): the benchmark gram SET is folded into a
  * fixed m-bit array, and the probe side tests k bit positions per gram —
  * one-sided error (false POSITIVES only, never false negatives), so a
  * bloom-clean document is PROVABLY benchmark-clean, and the flagged rest
  * is a small candidate set for exact re-check.
  *
  * Why this matters at 100 TB: q61's decontamination broadcasts the gram
  * set (or shuffle-joins past a threshold — `TextOps.sizedSemiJoin`).
  * Both scale with |benchmark|. The filter is CONSTANT-size: m = 2^20
  * bits = 128 KiB here regardless of benchmark size (size m to
  * ~10·|grams| for ~1% FP in deployment), rides the plan as ONE literal
  * array, and the probe is pure per-row codegen — no join, no shuffle,
  * no driver-side set.
  *
  * Determinism: positions are bit-fields of the SAME 60-bit md5 gram
  * hash every other dedup operator uses (`TextOps.gramHash64`): the
  * 60 bits split exactly into k = 3 fields of 20 bits (m = 2^20). No
  * second hash family, and a DuckDB oracle reproduces membership
  * bit-for-bit from `(hg >> s) & (m-1)` — false positives included,
  * because a Bloom filter's CONTENT is a pure function of the input set.
  */
object Bloom {

  /** m = 2^20 bits; k = 3 positions of 20 bits each from one 60-bit hash. */
  val MBits: Int = 1 << 20
  private val Mask = lit((MBits - 1).toLong)
  private val Shifts = Seq(0, 20, 40)

  /** The k bit positions of one 60-bit gram hash. */
  def positions(hg: Column): Seq[Column] =
    Shifts.map(s => shiftright(hg, s).bitwiseAND(Mask))

  /** Build the filter from a frame of 60-bit gram hashes: distinct bit
    * positions are aggregated DISTRIBUTED (≤ m of them survive), then the
    * bounded position list lands on the driver and packs into m/64 longs.
    * The collect is capped at m ints (4 MiB at m=2^20) by construction —
    * never benchmark-sized.
    */
  def build(grams: DataFrame, hashCol: String): Array[Long] = {
    val mask = new Array[Long](MBits / 64)
    grams.select(explode(array(positions(col(hashCol)): _*)).as("p"))
      .distinct()
      .collect()
      .foreach { r =>
        val p = r.getLong(0)
        mask((p >> 6).toInt) |= (1L << (p & 63).toInt)
      }
    mask
  }

  /** Membership probe: all k bits set. Pure per-row expression over the
    * broadcast-as-literal mask — `shiftright` is called through the SQL
    * function registry because the Scala helper only accepts a literal
    * shift amount while the bit index here is a column.
    */
  def mightContain(mask: Array[Long], hg: Column): Column = {
    val m = typedLit(mask.toSeq)
    positions(hg).map { p =>
      call_function("shiftright",
        element_at(m, (shiftright(p, 6) + lit(1)).cast("int")),
        p.bitwiseAND(lit(63L)).cast("int")).bitwiseAND(lit(1L))
    }.reduce(_ + _) === lit(Shifts.length.toLong)
  }
}
