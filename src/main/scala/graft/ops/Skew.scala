package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (PLANS.md scale posture).
  *
  * First line of defense is AQE's runtime skew-join splitting
  * (spark.sql.adaptive, enabled in every entry point). This operator is
  * the STATIC fallback for the case AQE can't fix: a shuffle join where
  * one side has pathological hot keys and the other side is small enough
  * to replicate per-salt but too big to broadcast outright.
  *
  * `saltedJoin(big, small, keys, salts)`: the big side gets a random-ish
  * but DETERMINISTIC salt (hash of all its columns mod salts — no RNG, so
  * retried tasks produce identical output); the small side is exploded
  * ×salts. The join key becomes (keys..., salt), splitting each hot key's
  * rows across `salts` reducers.
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    // replication is only sound when unmatched SMALL-side rows are never
    // emitted — a right/full outer would yield one row per salt replica
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
        "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin does not support joinType=$joinType (small side is replicated)")
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
