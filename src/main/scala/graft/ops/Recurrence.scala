package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A3 — the rising/falling recurrence (dischargeobs_write_xl.py:120-127).
  *
  * Per station over hourly buckets, with m = hourly max, l = hourly last:
  *   h(0) = m(0)
  *   h(i) = l(i) if m(i) <= h(i-1) else m(i)
  * NaN/null comparisons are false in pandas, so a null m(i) or null h(i-1)
  * selects m(i) — reproduced exactly (the reference itself flags the NaN
  * hours as suspect; we match its behavior, see the `!!!` comments at
  * dischargeobs_write_xl.py:120-121).
  *
  * This depends on the operator's own previous OUTPUT, so it is not a window
  * function. It IS embarrassingly parallel across stations: implemented as a
  * typed per-key sorted scan (`groupByKey.flatMapGroups`) — one shuffle on
  * the station key, sequential only within a key, no cross-station barrier.
  * At 100 TB the bucket count per station is bounded (hours per year), so
  * the in-memory sort per group is small even when the table is huge.
  */
object Recurrence {

  case class BucketIn(key: String, bucket: java.sql.Timestamp,
                      maxV: Option[Double], lastV: Option[Double])
  case class BucketOut(key: String, bucket: java.sql.Timestamp, h: Option[Double])

  def risingFalling(spark: SparkSession, df: DataFrame,
                    keyCol: String, bucketCol: String,
                    maxCol: String, lastCol: String): DataFrame = {
    import spark.implicits._
    val ds: Dataset[BucketIn] = df.select(
      col(keyCol).cast("string").as("key"),
      col(bucketCol).cast("timestamp").as("bucket"),
      col(maxCol).cast("double").as("maxV"),
      col(lastCol).cast("double").as("lastV")).as[BucketIn]

    ds.groupByKey(_.key)
      .flatMapGroups { (k: String, it: Iterator[BucketIn]) =>
        val sorted = it.toArray.sortBy(_.bucket.getTime)
        var prev: Option[Double] = None
        sorted.iterator.map { r =>
          // pandas: if m(i) <= h(i-1): h(i) = l(i) else keep m(i)
          val h = (r.maxV, prev) match {
            case (Some(m), Some(p)) if m <= p => r.lastV
            case (m, _)                       => m
          }
          prev = h
          BucketOut(k, r.bucket, h)
        }
      }
      .toDF("key", "bucket", "h")
  }
}
