package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The CLI must reproduce the reference's command workflow (§2.2):
  * create → append ×2 → get returns all content merged in timestamp
  * order; merge compacts; rainstorm runs the pipeline; ls/store list.
  * This mirrors reference test4 (append then get) end-to-end through
  * the SAME command names a reference user types. */
class GraftCliSpec extends AnyFunSuite with SparkSuite {

  test("create/append/get/merge workflow (reference test4 analogue)") {
    val root = Files.createTempDirectory("cli_root").toString
    val dir = Files.createTempDirectory("cli_files")
    val f1 = dir.resolve("base.txt"); Files.writeString(f1, "line1\nline2\n")
    val f2 = dir.resolve("app1.txt"); Files.writeString(f2, "line3\n")
    val f3 = dir.resolve("app2.txt"); Files.writeString(f3, "line4\n")
    val out = dir.resolve("out.txt")

    GraftCli.run(spark, root, "create", Seq(f1.toString, "log"))
    GraftCli.run(spark, root, "append", Seq(f2.toString, "log"))
    GraftCli.run(spark, root, "append", Seq(f3.toString, "log"))
    GraftCli.run(spark, root, "get", Seq("log", out.toString))
    assert(Files.readString(out) == "line1\nline2\nline3\nline4\n")

    // merge (compaction) must not change the read content
    GraftCli.run(spark, root, "merge", Seq("log"))
    GraftCli.run(spark, root, "get", Seq("log", out.toString))
    assert(Files.readString(out) == "line1\nline2\nline3\nline4\n")

    // create refuses overwrite, like the reference
    intercept[Exception] {
      GraftCli.run(spark, root, "create", Seq(f1.toString, "log"))
    }
  }

  test("rainstorm command runs the t2 pipeline end-to-end") {
    val dir = Files.createTempDirectory("cli_rs")
    val src = dir.resolve("signs.txt")
    Files.writeString(src,
      "-88.2,40.1,1001,Stop,30x30,None,Punched Telespar,2005,Warning,none\n" +
        "-88.6,40.5,1005,Warn,12x18,None,Punched Telespar,2009,Warning,none\n" +
        "-88.7,40.6,1006,Warn2,12x18,None,xPunched Telespar,2010,Stop,none\n")
    val dest = dir.resolve("out").toString
    GraftCli.run(spark, dir.toString, "rainstorm",
      Seq("filter_field_eq:6:Punched Telespar", "count:8",
        src.toString, dest, "2"))
    val lines = Files.list(java.nio.file.Paths.get(dest)).iterator()
    val got = scala.jdk.CollectionConverters.IteratorHasAsScala(lines).asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(p => scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(p)).asScala)
      .toSeq.sorted
    assert(got == Seq("Warning,2"))
  }

  test("unknown command fails loudly") {
    intercept[IllegalArgumentException] {
      GraftCli.run(spark, "/tmp/x", "bogus", Seq())
    }
  }
}
