package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomSpec extends SparkSpec {

  // Compose a 60-bit hash from three 20-bit fields — the INVERSE of
  // Bloom.positions, so membership outcomes are decidable by hand.
  private def h(p0: Long, p1: Long, p2: Long): Long =
    p0 | (p1 << 20) | (p2 << 40)

  test("no false negatives; a constructed cross-member hash false-positives") {
    import spark.implicits._
    val bench = Seq(h(1, 2, 3), h(4, 5, 6))
    val mask = Bloom.build(bench.toDF("hg"), "hg")
    // set bits are exactly the six member positions
    val setBits = (0 until Bloom.MBits).filter(p => (mask(p >> 6) & (1L << (p & 63))) != 0)
    assert(setBits === Seq(1, 2, 3, 4, 5, 6))
    val probes = Seq(
      h(1, 2, 3),   // member → hit (no false negatives, ever)
      h(4, 5, 6),   // member → hit
      h(1, 5, 3),   // NON-member whose three positions are all covered by
                    // DIFFERENT members → the classic Bloom false positive
      h(1, 2, 7),   // one uncovered position → miss
      h(9, 10, 11)) // fully uncovered → miss
    val got = probes.toDF("hg")
      .select(col("hg"), Bloom.mightContain(mask, col("hg")).as("hit"))
      .as[(Long, Boolean)].collect().toMap
    assert(got(h(1, 2, 3)) && got(h(4, 5, 6)))
    assert(got(h(1, 5, 3)), "cross-member FP must hit — that is Bloom semantics")
    assert(!got(h(1, 2, 7)) && !got(h(9, 10, 11)))
  }

  test("positions split the md5 gram hash exactly like the oracle's bit-fields") {
    import spark.implicits._
    // independent reference: JDK MessageDigest on the gram string, first
    // 15 hex chars as the 60-bit hash, then plain JVM shifts
    val gram = "some gram text"
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(gram.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val hg = java.lang.Long.parseLong(hex.take(15), 16)
    val expected = Seq(hg & 0xFFFFFL, (hg >> 20) & 0xFFFFFL, (hg >> 40) & 0xFFFFFL)
    val got = Seq(gram).toDF("g")
      .select(array(Bloom.positions(TextOps.gramHash64(spark, col("g"))): _*))
      .as[Seq[Long]].head()
    assert(got === expected)
  }
}
