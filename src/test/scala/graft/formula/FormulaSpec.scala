package graft.formula

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** F11 — every grammar feature observed in Station_Estimates.csv:1-19 is a
  * test vector (SURVEY §5.1), plus rejection of anything outside the
  * grammar (the eval() elimination, SURVEY §7.4.6).
  */
class FormulaSpec extends SparkSpec {

  private def eval1(formula: String, refs: Map[String, Double]): Double = {
    val df = spark.createDataFrame(Seq((1, 0))).toDF("a", "b")
    val c = Formula.compile(formula, n => lit(refs(n)))
    df.select(c.cast("double").as("v")).head().getDouble(0)
  }

  test("quadratic with clip — Station_Estimates.csv:2") {
    val f = "(0.0006*{08KG001}^2+0.0928*{08KG001}-0.5642).clip(lower=0.001)"
    val x = 100.0
    assert(math.abs(eval1(f, Map("08KG001" -> x)) -
      (0.0006 * x * x + 0.0928 * x - 0.5642)) < 1e-9)
    // clip floor engages for small x
    assert(eval1(f, Map("08KG001" -> 0.0)) === 0.001)
  }

  test("sum inside product — csv:3") {
    assert(math.abs(eval1("1.11*({08MB012}+{08MB006})",
      Map("08MB012" -> 2.0, "08MB006" -> 3.0)) - 5.55) < 1e-9)
  }

  test("fractional power, nested — csv:5") {
    val v = eval1("(2.0476*{10CA001}^0.40425)^2", Map("10CA001" -> 50.0))
    val exp = math.pow(2.0476 * math.pow(50.0, 0.40425), 2)
    assert(math.abs(v - exp) < 1e-9)
  }

  test("multi-ref linear — csv:7") {
    val v = eval1("1.1907*{08HB023}+1.9845*{08HB008}+20.819",
      Map("08HB023" -> 10.0, "08HB008" -> 5.0))
    assert(math.abs(v - (1.1907 * 10 + 1.9845 * 5 + 20.819)) < 1e-9)
  }

  test("subtraction chain with clip on parens — csv:15") {
    val v = eval1("(20.96*({07FA004}-{07FA006}-{07FB008})).clip(lower=20)",
      Map("07FA004" -> 10.0, "07FA006" -> 3.0, "07FB008" -> 2.0))
    assert(math.abs(v - 20.96 * 5.0) < 1e-9)
    val clipped = eval1("(20.96*({07FA004}-{07FA006}-{07FB008})).clip(lower=20)",
      Map("07FA004" -> 1.0, "07FA006" -> 3.0, "07FB008" -> 2.0))
    assert(clipped === 20.0)
  }

  test("power binds tighter than unary product; right-assoc") {
    // 2*{x}^2 = 2*(x^2), not (2x)^2
    assert(eval1("2*{x}^2", Map("x" -> 3.0)) === 18.0)
  }

  test("refs extraction matches in_brackets") {
    val ast = Formula.parse("0.1*{08KG001}+0.4*{08JB003}")
    assert(Formula.refs(ast) === Set("08KG001", "08JB003"))
  }

  test("grammar rejection: anything outside the observed language") {
    Seq("__import__('os')", "{x}.clip(upper=3)", "{x}+", "foo({x})", "{x}}",
        "1.2.3*{x}", "{x}*.", "{08 KG001}+1")
      .foreach { bad =>
        assertThrows[RuntimeException](Formula.parse(bad))
      }
  }

  test("clip propagates null inputs (pandas NaN.clip == NaN), not the floor") {
    val df = spark.createDataFrame(Seq(Tuple1(Option.empty[Double]), Tuple1(Some(-5.0))))
      .toDF("x")
    val out = df.select(Formula.compile("({x}).clip(lower=1)",
        _ => org.apache.spark.sql.functions.col("x")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(out === Seq(None, Some(1.0)))
  }

  test("EstimateOnlyIfMissing honored by applyEstimates") {
    val df = spark.createDataFrame(Seq(
      (1.0, Some(5.0)), (2.0, None: Option[Double]))).toDF("src", "out")
    val res = Formula.applyEstimates(df,
      Seq(("out", "2*{src}", true)), n => col(n))
      .select("out").collect().map(_.getDouble(0)).sorted
    assert(res.toSeq === Seq(4.0, 5.0)) // null estimated, non-null kept
  }
}
