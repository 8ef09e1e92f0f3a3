package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication at scale: exact, MinHash+LSH, SimHash and blocked
  * n-gram Jaccard (builder brief; no reference analog — these extend the
  * engine for training-data pipelines).
  *
  * Scale design notes:
  *  - MinHash signatures are computed per-row over the shingle ARRAY with
  *    `array_min(transform(...))` — no explode, no extra shuffle; the only
  *    shuffles are the band-bucket self-join (on band hash — uniformly
  *    distributed, skew-free) and the final distinct.
  *  - Hash family: md5(seed || '|' || shingle) compared as STRINGS — engine
  *    portable (bit-identical in any SQL engine), uniform, and seeds make
  *    the k permutations independent.
  *  - Blocked Jaccard is quadratic ONLY within a block (lang, source) —
  *    the standard blocking trick; block size is bounded so the join stays
  *    shuffle-friendly at 100 TB.
  */
object NearDup {

  /** Exact dedup: group by content hash, keep the smallest id.
    * Map-side partial aggregation ⇒ one skew-free shuffle on the hash.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature columns m0..m{k-1} from a shingle-array column. */
  def withMinhash(df: DataFrame, shingleCol: String, k: Int): DataFrame =
    (0 until k).foldLeft(df) { (acc, i) =>
      acc.withColumn(s"m$i",
        array_min(transform(col(shingleCol),
          s => md5(concat(lit(i), lit("|"), s)))))
    }

  /** LSH band keys: `bands` columns, each the md5 of `rowsPerBand`
    * consecutive minhashes. P(candidate) = 1-(1-J^r)^b.
    */
  def withBands(df: DataFrame, k: Int, bands: Int): DataFrame = {
    val r = k / bands
    (0 until bands).foldLeft(df) { (acc, b) =>
      acc.withColumn(s"band$b",
        md5(concat_ws("#", (b * r until (b + 1) * r).map(i => col(s"m$i")): _*)))
    }
  }

  /** Candidate pairs from band collisions, verified with exact Jaccard on
    * the shingle sets. Returns (id_a, id_b, jaccard), id_a < id_b.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, shingleCol: String,
                      k: Int = 16, bands: Int = 8): DataFrame = {
    val sig = withBands(withMinhash(df, shingleCol, k), k, bands)
      .select(col(idCol).as("id"), col(shingleCol).as("sh"),
              array((0 until bands).map(b => col(s"band$b")): _*).as("bands"))
    val exploded = sig.select(col("id"), col("sh"),
      posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
              col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", round(col("common") /
        (size(col("sh_a")) + size(col("sh_b")) - col("common")), 4))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash fingerprint (16-bit here for oracle-checkability; the width is
    * a parameter). Token hash = first 60 bits of md5 as an integer; each bit
    * contributes ±1 weighted by occurrence; fingerprint bit = sign.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              bits: Int = 16): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val hashed = df.select(col(idCol),
      explode(toks).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
    val bitSums = (0 until bits).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b"))
    val agg = hashed.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until bits).map(b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce((a, b) => a + b)
    agg.select(col(idCol), fp.as("simhash"))
  }

  /** Blocked n-gram Jaccard near-dup pairs: quadratic only within a block. */
  def blockedJaccardPairs(df: DataFrame, idCol: String, shingleCol: String,
                          blockCols: Seq[String], minJaccard: Double): DataFrame = {
    val base = df.select((blockCols.map(col) :+ col(idCol).as("id") :+
      col(shingleCol).as("sh")): _*)
    val a = base.as("a")
    val b = base.as("b")
    val blockCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)
    a.join(b, blockCond && col("a.id") < col("b.id"))
      .withColumn("common", size(array_intersect(col("a.sh"), col("b.sh"))).cast("double"))
      .withColumn("jaccard", round(col("common") /
        (size(col("a.sh")) + size(col("b.sh")) - col("common")), 4))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("jaccard"))
  }
}
