package graft.text

import graft.SparkSpec
import graft.sim.Spectral

/** Spectral: covariance cells hand-checked on a tiny matrix, and the
  * driver power iteration recovering a known principal direction.
  */
class SpectralSpec extends SparkSpec {
  import spark.implicits._

  test("covarianceMatrix: hand-checked 2-dim cells") {
    // vectors (1,0), (0,1), (1,1): means (2/3, 2/3)
    // var(x)=var(y)=E[x²]−E[x]² = 2/3−4/9 = 2/9; cov(x,y)=1/3−4/9=−1/9
    val df = Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), Seq(1.0f, 1.0f)).toDF("v")
    val out = Spectral.covarianceMatrix(df, "v")
      .collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) -> r)
      .toMap
    assert(out.size == 3) // (0,0), (0,1), (1,1)
    assert(out((0L, 0L)).getAs[Long]("sxy") == 2000000L)
    assert(out((0L, 1L)).getAs[Long]("sxy") == 1000000L)
    assert(out((0L, 0L)).getAs[Long]("sx") == 2000000L)
    // 2/9 = 0.2222…, −1/9 = −0.1111… in micro units
    assert(out((0L, 0L)).getAs[Long]("cov_micro") == 222222L)
    assert(out((1L, 1L)).getAs[Long]("cov_micro") == 222222L)
    assert(out((0L, 1L)).getAs[Long]("cov_micro") == -111111L)
  }

  test("topEigenvector recovers a known principal direction") {
    // stretch dim 0 strongly: points along (2, 1) and its negation plus
    // small off-axis noise — principal direction ≈ (2,1)/√5
    val pts = Seq(
      Seq(2.0f, 1.0f), Seq(-2.0f, -1.0f), Seq(4.0f, 2.0f), Seq(-4.0f, -2.0f),
      Seq(0.1f, -0.2f), Seq(-0.1f, 0.2f))
    val cov = Spectral.covarianceMatrix(pts.toDF("v"), "v")
    val (vec, lambda) = Spectral.topEigenvector(cov)
    assert(vec.length == 2)
    val expected = Array(2.0 / math.sqrt(5.0), 1.0 / math.sqrt(5.0))
    vec.zip(expected).foreach { case (a, b) => assert(math.abs(a - b) < 0.01) }
    assert(lambda > 0.0)
    // sign convention: the largest-|component| coordinate is positive
    assert(vec(0) > 0.0)
  }

  test("topEigenvector rejects a partial triangle") {
    val df = Seq(Seq(1.0f, 2.0f)).toDF("v")
    // dropping (1,1) leaves (0,0) and (0,1): d is inferred as 2 but the
    // triangle is incomplete (a bare (0,0) would be a VALID 1-dim frame)
    val cov = Spectral.covarianceMatrix(df, "v").filter("NOT (i = 1 AND j = 1)")
    intercept[IllegalArgumentException] {
      Spectral.topEigenvector(cov)
    }
  }
}
