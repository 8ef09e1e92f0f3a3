package graft.core

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSpec

class EngineLogSpec extends SparkSpec {

  test("actions append parseable lines; failures log FAIL; rotation shifts files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("engine-log").toString
    // tiny maxBytes so a handful of actions exercises rotation
    EngineLog.install(spark, dir, maxBytes = 200L, maxFiles = 10)
    try {
      (1 to 6).foreach { i => Seq(i).toDF("x").count() }
      intercept[Exception] {
        Seq(1).toDF("x").selectExpr("assert_true(x > 1)").collect()
      }
      // listener delivery is asynchronous — wait for the FAIL line
      val deadline = System.nanoTime() + 10000000000L
      def allLines() = Files.list(Paths.get(dir)).iterator().asScala.toSeq
        .flatMap(p => Files.readAllLines(p).asScala)
      while (!allLines().exists(_.contains("FAIL")) && System.nanoTime() < deadline)
        Thread.sleep(100)
      val lines = allLines()
      assert(lines.nonEmpty)
      // every line has the 6 tab-separated fields and a terminal status
      lines.foreach { l =>
        val f = l.split("\t")
        assert(f.length === 6, l)
        assert(f(5) == "OK" || f(5).startsWith("FAIL"), l)
      }
      assert(lines.exists(l => l.contains("\tcount\t") && l.contains("OK")))
      assert(lines.exists(_.contains("FAIL")))
      // rotation happened and respected maxFiles
      val names = Files.list(Paths.get(dir)).iterator().asScala
        .map(_.getFileName.toString).toSet
      assert(names.contains("engine.log") && names.contains("engine.log.1"))
      assert(!names.exists(_.stripPrefix("engine.log.").toIntOption.exists(_ > 10)))
    } finally EngineLog.uninstall(spark, dir)
    // uninstalled: new actions no longer append
    val before = Files.list(Paths.get(dir)).iterator().asScala
      .map(p => Files.size(p)).sum
    import spark.implicits._
    Seq(1).toDF("x").count()
    Thread.sleep(300)
    val after = Files.list(Paths.get(dir)).iterator().asScala
      .map(p => Files.size(p)).sum
    assert(after === before)
  }
}
