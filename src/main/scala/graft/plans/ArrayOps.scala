package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Custom Catalyst expressions for the near-dup kernels (SURVEY §7.3
  * preference order (b): a native Expression where built-ins can't express
  * the computation efficiently).
  *
  * `array_intersect` builds a boxed hash set PER ROW — on the blocked
  * Jaccard join that is 159k pairs × ~550 boxed longs at sf0.1 (~10 s,
  * the single hottest kernel in the bench). Over SORTED long arrays the
  * intersection size is a primitive two-pointer merge: `toLongArray()`
  * (one primitive copy), zero allocation, zero hashing. Sorting happens
  * once per DOCUMENT (codegen'd `sort_array`), not once per pair.
  */
case class LongSortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toLongArray()
    val y = b.asInstanceOf[ArrayData].toLongArray()
    var i = 0; var j = 0; var c = 0
    while (i < x.length && j < y.length) {
      val xi = x(i); val yj = y(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ArrayOps {
  private val FnName = "sorted_intersect_count"

  /** Column API for the expression; registers the session function on
    * first use (Column construction from a raw Expression is not public
    * API in Spark 4, the registry route is).
    */
  def sortedIntersectCount(df: DataFrame, a: String, b: String): Column = {
    df.sparkSession.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => LongSortedIntersectCount(exprs(0), exprs(1)), "scala_udf")
    // a/b are SQL column references (possibly alias-qualified, e.g. "a.sh")
    org.apache.spark.sql.functions.expr(s"$FnName($a, $b)")
  }
}
