package graft

import org.scalatest.funsuite.AnyFunSuite

/** Doc contract for README's operator index (VERDICT r10 #6): with 206
  * registered queries across 20+ files, the README must map capability →
  * entry point → query, and must not go stale as queries are added or
  * files move. Fails if a registered query's short key is missing from
  * the index section, or an entry-point path cited there doesn't exist.
  */
class DocIndexSpec extends AnyFunSuite {
  private lazy val indexSection: String = {
    val src = scala.io.Source.fromFile("README.md", "UTF-8")
    val text = try src.mkString finally src.close()
    val start = text.indexOf("## Operator index")
    assert(start >= 0, "README.md has no '## Operator index' section")
    val rest = text.substring(start + 3)
    val end = rest.indexOf("\n## ")
    if (end >= 0) rest.substring(0, end) else rest
  }

  test("every registered query appears in the README operator index") {
    val missing = SparkEntry.queries.keySet.toSeq.sorted.filterNot { name =>
      val short = name.takeWhile(_ != '_')
      // boundary match so q11 doesn't ride on q110
      ("(?<![0-9a-z])" + short + "(?![0-9])").r.findFirstIn(indexSection).isDefined
    }
    assert(missing.isEmpty, s"queries absent from README operator index: $missing")
  }

  test("every entry-point path cited in the index exists") {
    val cited = """`([a-z/]+/[A-Za-z]+\.scala)`""".r
      .findAllMatchIn(indexSection).map(_.group(1)).toSeq.distinct
    assert(cited.nonEmpty, "index cites no entry-point paths")
    val stale = cited.filterNot(p =>
      java.nio.file.Files.exists(java.nio.file.Paths.get("src/main/scala/graft", p)))
    assert(stale.isEmpty, s"stale entry points in README operator index: $stale")
  }
}
