package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval joins re-expressed as EQUI-joins via time binning.
  *
  * Spark's planner turns a bare non-equi predicate
  * (`s <= p AND p <= e`) into a broadcast-nested-loop or cartesian
  * product — O(|A|·|B|) row comparisons, fine when one side is tiny and
  * catastrophic otherwise. The standard scale fix (the "overlap interval
  * join" binning construction used across distributed engines; public
  * technique) maps both sides onto fixed-width time bins so the planner
  * sees a plain equi-join on the bin id:
  *
  *  - an interval [s, e] registers in every bin its span touches
  *    (`explode(sequence(s div w, e div w))`);
  *  - a point registers in exactly ONE bin (`p div w`);
  *  - the equi-join on bin id then needs only the RESIDUAL range filter,
  *    evaluated in codegen on bin-colocated rows.
  *
  * Each true match surfaces exactly once (the point's single bin), so no
  * post-join dedup is needed — this is why the POINT side anchors the
  * construction; interval×interval overlap joins bin the same way but
  * dedup on the least shared bin.
  *
  * Scale levers: `binSeconds` trades replication (long intervals touch
  * many bins) against residual-filter selectivity (wide bins colocate
  * non-matches); pick it near the median interval length. A heavy tail
  * of LONG intervals is replication skew — at scale, route intervals
  * longer than k bins through a separate coarse-binned pass (same
  * construction, wider w) instead of letting one row explode into
  * thousands. The bin id is uniform by construction, so the shuffle
  * itself is skew-free in the common case.
  */
object RangeJoin {

  /** Join `points` to every row of `intervals` whose
    * `[startCol, endCol]` (inclusive) contains `pointCol`. Timestamp
    * columns; returns the joined frame with all columns of both inputs.
    */
  def intervalPointJoin(intervals: DataFrame, points: DataFrame,
                        startCol: String, endCol: String, pointCol: String,
                        binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    // `div` (floor-free integer division) keeps the bin id exact; epoch
    // seconds are non-negative for any post-1970 data and the residual
    // filter makes the join correct either way. The double cast handles
    // TIMESTAMP_NTZ inputs (no direct ntz→long cast); the session
    // timezone is pinned UTC repo-wide, so ntz→timestamp is stable.
    def bin(c: String) = s"cast(cast($c as timestamp) as long) div $binSeconds"
    val iv = intervals
      .withColumn("__bin", explode(sequence(
        expr(bin(startCol)), expr(bin(endCol)))))
    val pt = points
      .withColumn("__bin", expr(bin(pointCol)))
    iv.join(pt, Seq("__bin"))
      .filter(col(startCol) <= col(pointCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }

  /** Join rows of `a` and `b` whose inclusive intervals OVERLAP
    * (`sa <= eb AND sb <= ea`). Same binning construction; both sides
    * replicate into the bins they touch, and because an overlapping pair
    * shares EVERY bin their intersection covers, the join would emit it
    * once per shared bin — the `__bin == max(binA_start, binB_start)`
    * residual keeps exactly the FIRST shared bin (the later of the two
    * start bins is where the overlap begins), making each pair surface
    * exactly once without a post-join distinct. Column-name collisions
    * between `a` and `b` are the caller's concern, as with any join.
    */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame,
                          aStart: String, aEnd: String,
                          bStart: String, bEnd: String,
                          binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    def bin(c: String) = s"cast(cast($c as timestamp) as long) div $binSeconds"
    val av = a
      .withColumn("__sba", expr(bin(aStart)))
      .withColumn("__bin", explode(sequence(col("__sba"), expr(bin(aEnd)))))
    val bv = b
      .withColumn("__sbb", expr(bin(bStart)))
      .withColumn("__bin", explode(sequence(col("__sbb"), expr(bin(bEnd)))))
    av.join(bv, Seq("__bin"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd) &&
        col("__bin") === greatest(col("__sba"), col("__sbb")))
      .drop("__bin", "__sba", "__sbb")
  }
}
