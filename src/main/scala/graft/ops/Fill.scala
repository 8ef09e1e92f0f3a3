package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-filling window operators (SURVEY §2.7).
  *
  * W1 — forward-fill: `fillna(method='ffill')` per station down time order
  * (discharge_obs_pd.py:120-121,165; dischargeobs_write_xl.py:355). The
  * bounded variant (T5) fills only up to a cutoff timestamp — the reference
  * fills "up until current day" (dischargeobs_write_xl.py:353-355).
  *
  * Implementation: `last(value, ignoreNulls)` over an unbounded-preceding
  * running frame. Cost at scale: one shuffle on the partition keys + one
  * sort within partitions; no state accumulates on the driver.
  */
object Fill {

  /** Forward-fill `valueCol` within `parts` ordered by `order`. If `cutoff`
    * is given, rows where the predicate is false keep their original value
    * (bounded ffill, T5).
    */
  def ffill(df: DataFrame, parts: Seq[String], order: Seq[Column],
            valueCol: String, outCol: String,
            cutoff: Option[Column] = None): DataFrame = {
    val w = Window.partitionBy(parts.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = last(col(valueCol), ignoreNulls = true).over(w)
    val v = cutoff match {
      case Some(pred) => when(pred, filled).otherwise(col(valueCol))
      case None       => filled
    }
    df.withColumn(outCol, v)
  }

  /** W3 — last valid timestamp per partition: each station's latest
    * non-null observation time (dischargeobs_write_xl.py:347-348,384-385).
    */
  def lastValidTs(df: DataFrame, parts: Seq[String], tsCol: String,
                  valueCol: String, outCol: String): DataFrame = {
    val w = Window.partitionBy(parts.map(col): _*)
    df.withColumn(outCol,
      max(when(col(valueCol).isNotNull, col(tsCol))).over(w))
  }

  /** W2 — blank-on-repeat display labels
    * (dischargeobs_write_xl.py:51-55,85-88,167-168,308-312): suppress a
    * label equal to the previous row's label in export order.
    */
  def blankOnRepeat(df: DataFrame, parts: Seq[String], order: Seq[Column],
                    labelCol: String, outCol: String): DataFrame = {
    val w = Window.partitionBy(parts.map(col): _*).orderBy(order: _*)
    df.withColumn(outCol,
      when(lag(col(labelCol), 1).over(w) === col(labelCol), lit(""))
        .otherwise(col(labelCol)))
  }
}
