package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.RainStormJob

/** End-to-end pipeline tests mirroring the reference's own scenarios:
  * t1 = filter_contains → project (op1_t1 → op2_t1), t2 = field-eq →
  * count (op1_t2 → op2_t2), over a Traffic_Signs-shaped file
  * (FIXTURES §2), in batch and streaming form, including a
  * kill-and-restart from checkpoint (test_MP4 analogue). */
class RainStormJobSpec extends AnyFunSuite with SparkSuite {

  private val rows = Seq(
    "-88.2,40.1,1001,Stop,30x30,None,Punched Telespar,2005,Warning,none",
    "-88.3,40.2,1002,Yield,36x36,None,Unpunched Telespar,2006,Regulatory,none",
    "-88.4,40.3,1003,Speed,24x24,None,Square Post,2007,Warning,Punched note here",
    "-88.5,40.4,1004,Stop2,30x30,None,Punched Telespar,2008,Other,none",
    "-88.6,40.5,1005,Warn,12x18,None,Punched TelesparX,2009,Warning,none",
    "-88.7,40.6,1006,Warn2,12x18,None,xPunched Telespar,2010,Stop,none")

  private def tmpDir(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  private def readLines(dir: String): Seq[String] =
    Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".txt") ||
        p.getFileName.toString.startsWith("part-"))
      .flatMap(p => Files.readAllLines(p).asScala)
      .toSeq

  test("t1 batch: filter_contains -> project") {
    val src = tmpDir("rs_src")
    Files.write(src.resolve("signs.txt"), rows.mkString("\n").getBytes)
    val dest = tmpDir("rs_dest").toString + "/out"
    RainStormJob.runBatch(spark, "filter_contains:Punched", "project:2,3",
      src.toString + "/signs.txt", dest, numTasks = 3)
    assert(readLines(dest).sorted ==
      Seq("1001,Stop", "1003,Speed", "1004,Stop2", "1005,Warn", "1006,Warn2"))
  }

  test("t2 batch: filter_field_eq -> count") {
    val src = tmpDir("rs_src")
    Files.write(src.resolve("signs.txt"), rows.mkString("\n").getBytes)
    val dest = tmpDir("rs_dest").toString + "/out"
    RainStormJob.runBatch(spark, "filter_field_eq:6:Punched Telespar", "count:8",
      src.toString + "/signs.txt", dest, numTasks = 3)
    assert(readLines(dest).sorted == Seq("Other,1", "Warning,1"))
  }

  test("t1 streaming: transform path with exactly-once file sink") {
    val src = tmpDir("rs_ssrc")
    Files.write(src.resolve("signs.txt"), rows.mkString("\n").getBytes)
    val dest = tmpDir("rs_sdest").toString + "/out"
    RainStormJob.runStreamingToCompletion(spark,
      "filter_contains:Punched", "project:2,3", src.toString, dest)
    assert(readLines(dest).sorted ==
      Seq("1001,Stop", "1003,Speed", "1004,Stop2", "1005,Warn", "1006,Warn2"))
  }

  test("t2 streaming: aggregate snapshots converge to batch answer") {
    val src = tmpDir("rs_ssrc")
    Files.write(src.resolve("signs.txt"), rows.mkString("\n").getBytes)
    val dest = tmpDir("rs_sdest").toString + "/out"
    RainStormJob.runStreamingToCompletion(spark,
      "identity", "count:8", src.toString, dest)
    assert(readLines(dest).sorted ==
      Seq("Other,1", "Regulatory,1", "Stop,1", "Warning,3"))
  }

  test("streaming restart from checkpoint does not double-process (O9)") {
    val src = tmpDir("rs_rsrc")
    val dest = tmpDir("rs_rdest").toString + "/out"
    val ckpt = tmpDir("rs_rckpt").toString
    Files.write(src.resolve("a.txt"), rows.take(3).mkString("\n").getBytes)
    val q1 = RainStormJob.runStreaming(spark,
      "filter_contains:Punched", "project:2,3", src.toString, dest, ckpt)
    q1.awaitTermination()
    // second wave of data + restart from the same checkpoint
    Files.write(src.resolve("b.txt"), rows.drop(3).mkString("\n").getBytes)
    val q2 = RainStormJob.runStreaming(spark,
      "filter_contains:Punched", "project:2,3", src.toString, dest, ckpt)
    q2.awaitTermination()
    // a.txt rows must appear exactly once despite the restart
    assert(readLines(dest).sorted ==
      Seq("1001,Stop", "1003,Speed", "1004,Stop2", "1005,Warn", "1006,Warn2"))
  }
}
