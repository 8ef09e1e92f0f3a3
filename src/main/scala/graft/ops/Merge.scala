package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Coalescing merge operators (SURVEY §2.5 — the J3/J9 precedence duality).
  *
  * Two opposite cell-level upsert precedences both exist in the reference:
  *  - `combine_first` (discharge_obs_pd.py:176-190): OLD non-null wins, new
  *    fills holes — the merge-upsert used for instantaneous partitions.
  *  - `Series.update` (dischargeobs_write_xl.py:351): NEW non-null wins.
  *
  * In the long (key → value) model each is one full-outer join plus one
  * `coalesce` per value column. The join shuffles both sides on `keys`; at
  * scale both sides are parquet tables partitioned identically (yyyymm), so
  * only the overlapping partitions need to be read (partition pruning does
  * that when callers filter on the partition key).
  */
object Merge {

  private def merge(old: DataFrame, nw: DataFrame, keys: Seq[String],
                    valueCols: Seq[String], oldWins: Boolean): DataFrame = {
    val o = old.select((keys ++ valueCols).map(col): _*)
      .withColumnsRenamed(valueCols.map(c => c -> s"__o_$c").toMap)
    val n = nw.select((keys ++ valueCols).map(col): _*)
      .withColumnsRenamed(valueCols.map(c => c -> s"__n_$c").toMap)
    val joined = o.join(n, keys, "full_outer") // using-join coalesces keys
    val values = valueCols.map { c =>
      val (a, b) = if (oldWins) (s"__o_$c", s"__n_$c") else (s"__n_$c", s"__o_$c")
      coalesce(col(a), col(b)).as(c)
    }
    joined.select(keys.map(col) ++ values: _*)
  }

  /** J3 — combine_first: old wins, new fills gaps. */
  def combineFirst(old: DataFrame, nw: DataFrame, keys: Seq[String],
                   valueCols: Seq[String]): DataFrame =
    merge(old, nw, keys, valueCols, oldWins = true)

  /** J9 — update: new wins, old kept where new is null or absent. */
  def updateWith(old: DataFrame, nw: DataFrame, keys: Seq[String],
                 valueCols: Seq[String]): DataFrame =
    merge(old, nw, keys, valueCols, oldWins = false)
}
