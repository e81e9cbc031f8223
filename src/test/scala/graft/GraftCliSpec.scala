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

  test("multiappend + getfromreplica converge (reference test5 analogue)") {
    val root = Files.createTempDirectory("cli_ma").toString
    val dir = Files.createTempDirectory("cli_ma_files")
    val f1 = dir.resolve("base.txt"); Files.writeString(f1, "base\n")
    val fa = dir.resolve("a.txt"); Files.writeString(fa, "from-a\n")
    val fb = dir.resolve("b.txt"); Files.writeString(fb, "from-b\n")
    val fc = dir.resolve("c.txt"); Files.writeString(fc, "from-c\n")
    GraftCli.run(spark, root, "create", Seq(f1.toString, "shared"))
    // concurrent appends from 3 "clients"
    GraftCli.run(spark, root, "multiappend",
      Seq("shared", s"$fa,$fb,$fc"))
    // reference test5_part2: fetch the same file from two different
    // replicas and diff — replica convergence means identical bytes
    val out1 = dir.resolve("out1.txt"); val out2 = dir.resolve("out2.txt")
    GraftCli.run(spark, root, "getfromreplica", Seq("vm2", "shared", out1.toString))
    GraftCli.run(spark, root, "getfromreplica", Seq("vm7", "shared", out2.toString))
    val got1 = Files.readString(out1)
    assert(got1 == Files.readString(out2))
    // all three appends present exactly once, base first (ts=0)
    assert(got1.startsWith("base\n"))
    Seq("from-a\n", "from-b\n", "from-c\n").foreach { chunk =>
      assert(got1.indexOf(chunk) >= 0 && got1.indexOf(chunk) == got1.lastIndexOf(chunk))
    }
  }

  test("list_mem_ids prints a hash-sorted ring; ls shows 3-replica placement") {
    // ring is hash-sorted and stable
    val r = GraftCli.ring(10)
    assert(r.map(_._1) == r.map(_._1).sorted)
    assert(r.map(_._2).toSet.size == 10)
    // placement: 3 distinct replicas, deterministic, starting at the
    // first node with hash >= fnv(name) on the sorted ring
    val p = GraftCli.placement("somefile.txt", 10)
    assert(p.size == 3 && p.toSet.size == 3)
    assert(GraftCli.placement("somefile.txt", 10) == p)
    val h = graft.functions.Fnv1a32.hash("somefile.txt".getBytes("UTF-8"))
    val expectedPrimary = r.find(_._1 >= h).map(_._2).getOrElse(r.head._2)
    assert(p.head == expectedPrimary)
  }

  test("compact snapshots the log: a mid-compaction append survives") {
    import org.apache.spark.sql.SaveMode
    import spark.implicits._
    val root = Files.createTempDirectory("cli_snap").toString
    val store = new graft.sources.AppendLogStore(spark, s"$root/f")
    store.create(Seq((0L, "base\n")).toDF("ts", "content"))
    store.append(Seq((10L, "early\n")).toDF("ts", "content"))
    // an append that is IN FLIGHT while compact runs: simulate by
    // writing a segment directory without its _SUCCESS marker, then
    // completing it after compact
    val inflight = s"$root/f/log/append_inflight"
    Seq((20L, "late\n")).toDF("ts", "content")
      .write.mode(SaveMode.ErrorIfExists).parquet(inflight)
    val success = new java.io.File(s"$inflight/_SUCCESS")
    assert(success.exists)
    assert(success.delete())                     // now "uncommitted"
    store.compact(Seq("content"))                // must not destroy it
    assert(new java.io.File(inflight).exists)
    assert(new java.io.File(success.getPath).createNewFile()) // commit lands
    val got = store.read(Seq("content")).select("content").as[String].collect()
    assert(got.toSeq == Seq("base\n", "early\n", "late\n"))
  }

  test("unknown command fails loudly") {
    intercept[IllegalArgumentException] {
      GraftCli.run(spark, "/tmp/x", "bogus", Seq())
    }
  }
}
