package graft.core

import org.apache.spark.sql.DataFrame

/** The block-backed RDD behind a localCheckpoint'd frame, if any.
  * `Dataset.unpersist` only clears CacheManager entries — checkpoint
  * blocks are RDD-level persists, reachable only through the plan's
  * `LogicalRDD` leaf. Freeing superseded checkpoints matters for
  * REPEATED invocations in one session: without it every call leaks a
  * block set into the BlockManager (the r05 q61 bench-repeat growth).
  * ONE shared helper on purpose: locating the blocks is plan-shape
  * dependent, and a Spark upgrade that changes the wrapper must be
  * fixed in one place, not in per-module copies.
  */
object Checkpoints {
  def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
      case _ => None
    }

  def release(df: DataFrame): Unit =
    checkpointRdd(df).foreach(_.unpersist(blocking = false))
}
