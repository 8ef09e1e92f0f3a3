package graft.text

import java.nio.file.Files

import graft.SparkSpec
import graft.sim.IndexMeta

/** The shared index-meta contract (VERDICT r13 #4): every persisted
  * tick index — embedding `_bands_meta`, fingerprint `_fpbands_meta`,
  * the corpus MinHash index's params row — stores/reads/guards through
  * ONE module. These cases pin the contract itself; the tick-level
  * behavior (rebuild-before-serve, replay) is pinned in StreamingSpec.
  */
class IndexMetaSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("idxmeta").toString + "/meta"

  test("write/read round-trip, absent dir is None, multi-row refuses") {
    val dir = tmp()
    assert(IndexMeta.read(spark, dir, Seq("a")) === None)
    IndexMeta.write(spark, dir, Seq("a" -> 3L, "b" -> 77L))
    assert(IndexMeta.read(spark, dir, Seq("a", "b"))
      === Some(Map("a" -> 3L, "b" -> 77L)))
    // a meta artifact with more than one row is corrupt — refuse loudly
    import spark.implicits._
    Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
      .write.mode("overwrite").parquet(dir)
    val boom = intercept[IllegalArgumentException](
      IndexMeta.read(spark, dir, Seq("a", "b")))
    assert(boom.getMessage.contains("expected exactly 1"))
  }

  test("legacy INT-column artifacts read through the long cast") {
    // pre-r14 writers stored bands/rows_per_band as INT; the module
    // must keep reading them (the zero-behavior-change requirement)
    import spark.implicits._
    val dir = tmp()
    Seq((4, 5, 40L)).toDF("bands", "rows_per_band", "built_n")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    assert(IndexMeta.read(spark, dir, Seq("bands", "rows_per_band", "built_n"))
      === Some(Map("bands" -> 4L, "rows_per_band" -> 5L, "built_n" -> 40L)))
  }

  test("ensureFresh: stale rebuilds once, fresh no-ops, legacy adopts, " +
      "invariant mismatch refuses") {
    val dir = tmp()
    var rebuilds = List.empty[Long]
    def ensure(needed: Long, n: Long): Long =
      IndexMeta.ensureFresh(spark, dir,
        invariants = Seq("bands" -> 4L), dialName = "width",
        neededDial = needed, legacyDial = 2L, corpusN = n,
        staleWhen = (built, need) => need > built, what = "spec index") {
        w => rebuilds ::= w
      }
    // legacy (no meta): adopt the legacy dial, record it, NO rebuild
    assert(ensure(needed = 2L, n = 10L) === 2L)
    assert(rebuilds.isEmpty)
    assert(IndexMeta.read(spark, dir, Seq("bands", "width", "built_n"))
      === Some(Map("bands" -> 4L, "width" -> 2L, "built_n" -> 10L)))
    // grown corpus: stale → rebuild at the needed dial, meta updated
    assert(ensure(needed = 5L, n = 100L) === 5L)
    assert(rebuilds === List(5L))
    assert(IndexMeta.read(spark, dir, Seq("width", "built_n"))
      === Some(Map("width" -> 5L, "built_n" -> 100L)))
    // fresh re-check: no rebuild, meta NOT rewritten (built_n stays)
    assert(ensure(needed = 5L, n = 120L) === 5L)
    assert(rebuilds === List(5L))
    assert(IndexMeta.read(spark, dir, Seq("built_n"))
      === Some(Map("built_n" -> 100L)))
    // a caller wired for different invariants must refuse loudly —
    // serving a mismatched contract is never a silent rebuild
    val boom = intercept[IllegalArgumentException] {
      IndexMeta.ensureFresh(spark, dir,
        invariants = Seq("bands" -> 8L), dialName = "width",
        neededDial = 5L, legacyDial = 2L, corpusN = 120L,
        staleWhen = (b, n) => n > b, what = "spec index")(_ => ())
    }
    assert(boom.getMessage.contains("bands"))
  }
}
