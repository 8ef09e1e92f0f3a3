package graft.export

import java.nio.file.Files
import graft.SparkSpec

/** K4 BIFF8-in-CFB codec: container sanity, round-trip, upsert, and the
  * canonical-number rule that keeps grids byte-exact.
  */
class XlsSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory("xls").resolve(name).toString

  test("round-trip: numbers, non-canonical numerics, unicode, blanks") {
    val path = tmp("rt.xls")
    val g: Xls.Grid = (
      Array("DATE", "08MF005", "note"),
      Array(
        Array("2023-01-01", "1234.5", "naïve ünicode"),
        Array("2023-01-02", "", "007"),       // blank + leading-zero TEXT
        Array("2023-01-03", "-2.5E-3", "1e3"))) // canonical vs non-canonical
    Xls.write(path, Seq("2023" -> g))

    // container magic
    val head = Files.readAllBytes(java.nio.file.Paths.get(path)).take(4)
    assert(head.map(_ & 0xFF).toSeq === Seq(0xD0, 0xCF, 0x11, 0xE0))

    val back = Xls.read(path)
    assert(back.map(_._1) === Seq("2023"))
    val (h, rows) = back.head._2
    assert(h === g._1)
    assert(rows.map(_.toSeq) === g._2.map(_.toSeq))
  }

  test("multi-sheet + upsert: replace in place, append when absent") {
    val path = tmp("up.xls")
    val g = (Array("c"), Array(Array("1.0")))
    Xls.write(path, Seq("2022" -> g, "2023" -> g))
    Xls.upsertSheet(path, "2023", (Array("c"), Array(Array("99.0"))))
    Xls.upsertSheet(path, "2024", (Array("c"), Array(Array("42.0"))))
    val back = Xls.read(path)
    assert(back.map(_._1) === Seq("2022", "2023", "2024"))
    assert(back(1)._2._2.head.head === "99.0")
    assert(back(2)._2._2.head.head === "42.0")
  }

  test("writeXlsSheet: DataFrame nulls render as blank cells, doubles survive") {
    import spark.implicits._
    val path = tmp("df.xls")
    val df = Seq(("2023-01-01", Some(1.5)), ("2023-01-02", None: Option[Double]))
      .toDF("DATE", "08MF005")
    Exports.writeXlsSheet(df, path, "2023", "DATE")
    val (h, rows) = Xls.read(path).head._2
    assert(h === Array("DATE", "08MF005"))
    assert(rows.map(_.toSeq) === Array(Seq("2023-01-01", "1.5"), Seq("2023-01-02", "")))
  }

  test("large sheet crosses the 4096-byte padding cutoff and multiple sectors") {
    val path = tmp("big.xls")
    val rows = Array.tabulate(2000)(i => Array(s"r$i", (i + 0.5).toString))
    Xls.write(path, Seq("2023" -> ((Array("k", "v"), rows))))
    val (_, back) = Xls.read(path).head._2
    assert(back.length === 2000)
    assert(back(1999).toSeq === Seq("r1999", "1999.5"))
  }

  test("fuzz: 30 random grids round-trip through BOTH codecs byte-exactly") {
    val rnd = new scala.util.Random(20260812L)
    val alphabets = Seq(
      "abcXYZ019 .,&<>\"'\t", "日本語中文ünïcø∂é", "-+eE.0123456789")
    def cell(): String = {
      val a = alphabets(rnd.nextInt(alphabets.length))
      (0 until rnd.nextInt(12)).map(_ => a(rnd.nextInt(a.length))).mkString
    }
    (1 to 30).foreach { trial =>
      val nc = 1 + rnd.nextInt(6)
      val nr = rnd.nextInt(8)
      val grid: Xls.Grid = (
        Array.tabulate(nc)(c => s"c$c"),
        Array.fill(nr)(Array.fill(nc)(cell())))
      val nSheets = 1 + rnd.nextInt(3)
      val sheets = (1 to nSheets).map(i => s"s$i" -> grid)
      val px = tmp(s"f$trial.xlsx"); val pb = tmp(s"f$trial.xls")
      Xlsx.write(px, sheets)
      Xls.write(pb, sheets)
      (Xlsx.read(px) zip Xls.read(pb)).zipWithIndex.foreach {
        case (((nx, (hx, rx)), (nb, (hb, rb))), si) =>
          assert(nx === s"s${si + 1}" && nb === nx, s"trial $trial sheet $si name")
          // trailing all-blank columns/rows are structurally unrepresentable
          // in sparse cell formats; this fuzz generates non-empty headers so
          // widths always survive
          assert(hx.toSeq === grid._1.toSeq, s"trial $trial xlsx header")
          assert(hb.toSeq === grid._1.toSeq, s"trial $trial xls header")
          def canon(rows: Array[Array[String]]) =
            rows.map(_.toSeq).toSeq.reverse.dropWhile(_.forall(_.isEmpty)).reverse
          assert(canon(rx) === canon(grid._2), s"trial $trial xlsx rows")
          assert(canon(rb) === canon(grid._2), s"trial $trial xls rows")
      }
    }
  }
}
