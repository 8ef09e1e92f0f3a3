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

  test("a FAIL message containing tabs still yields 6 tab fields") {
    import spark.implicits._
    val dir = Files.createTempDirectory("engine-log-tab").toString
    EngineLog.install(spark, dir)
    try {
      intercept[Exception] {
        // raise_error gives us full control of the message text
        Seq(1).toDF("x")
          .selectExpr("raise_error('tabbed\\tmessage\\there')").collect()
      }
      val deadline = System.nanoTime() + 10000000000L
      def lines() = {
        val f = Paths.get(dir, "engine.log")
        if (Files.exists(f)) Files.readAllLines(f).asScala.toSeq else Nil
      }
      while (!lines().exists(_.contains("FAIL")) && System.nanoTime() < deadline)
        Thread.sleep(100)
      val fail = lines().filter(_.contains("FAIL"))
      assert(fail.nonEmpty)
      fail.foreach { l =>
        assert(l.split("\t").length === 6, l)
        assert(l.contains("tabbed message here"), l)
      }
    } finally EngineLog.uninstall(spark, dir)
  }

  test("two sessions logging to one dir share the rotation lock and interleave cleanly") {
    val dir = Files.createTempDirectory("engine-log-2s").toString
    val s2 = spark.newSession()
    // small maxBytes forces rotations mid-run; maxFiles is sized so the
    // TOTAL retained capacity still holds all 30 lines (~110 B each) —
    // otherwise rotation legitimately drops the oldest and the count
    // assertion below would misread retention as a lost write
    EngineLog.install(spark, dir, maxBytes = 300L, maxFiles = 30)
    EngineLog.install(s2, dir, maxBytes = 300L, maxFiles = 30)
    try {
      import spark.implicits._
      // hammer both sessions concurrently: without the shared per-dir
      // lock this interleaves writes with rotation renames
      val t = new Thread(() => (1 to 15).foreach { i =>
        val sqlc = s2
        import sqlc.implicits._
        Seq(i).toDF("y").count()
      })
      t.start()
      (1 to 15).foreach { i => Seq(i).toDF("x").count() }
      t.join()
      // async listener drain: poll until both sessions' lines landed
      def allLines() = Files.list(Paths.get(dir)).iterator().asScala.toSeq
        .flatMap(p => Files.readAllLines(p).asScala)
      val deadline = System.nanoTime() + 15000000000L
      while (allLines().size < 30 && System.nanoTime() < deadline)
        Thread.sleep(100)
      val all = allLines()
      assert(all.size >= 30, s"expected >=30 lines, got ${all.size}")
      // every line intact: 6 fields, terminal status — no torn writes
      all.foreach { l =>
        val f = l.split("\t")
        assert(f.length === 6, l)
        assert(f(5) == "OK" || f(5).startsWith("FAIL"), l)
      }
    } finally {
      EngineLog.uninstall(spark, dir)
      EngineLog.uninstall(s2, dir)
    }
  }
}
