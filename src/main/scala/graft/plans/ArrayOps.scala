package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  /** Real codegen (not CodegenFallback): this expression lives in JOIN
    * conditions, and a fallback expression there knocks the entire join
    * stage out of whole-stage codegen — measured 2× on the blocked
    * Jaccard join.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      s"""
        int $i = 0; int $j = 0; int $c = 0;
        final int $nx = $a.numElements();
        final int $ny = $b.numElements();
        while ($i < $nx && $j < $ny) {
          final long $xi = $a.getLong($i);
          final long $yj = $b.getLong($j);
          if ($xi == $yj) { $c++; $i++; $j++; }
          else if ($xi < $yj) { $i++; } else { $j++; }
        }
        ${ev.value} = $c;
      """
    })

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    // iterate ArrayData in place — toLongArray() would allocate a copy of
    // both arrays per PAIR (≈1.4 GB/s of garbage on the blocked join)
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    var xi = if (nx > 0) x.getLong(0) else 0L
    var yj = if (ny > 0) y.getLong(0) else 0L
    while (i < nx && j < ny) {
      if (xi == yj) {
        c += 1; i += 1; j += 1
        if (i < nx) xi = x.getLong(i)
        if (j < ny) yj = y.getLong(j)
      } else if (xi < yj) {
        i += 1; if (i < nx) xi = x.getLong(i)
      } else {
        j += 1; if (j < ny) yj = y.getLong(j)
      }
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
