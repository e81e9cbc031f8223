package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.core.GraftSession
import graft.sources.AppendLogStore
import graft.streaming.RainStormJob

/** The reference's terminal command surface (SURVEY §2.2,
  * user/user.go:320-559 `HandleTerminalInput`) as a Spark CLI — the
  * migration path for a reference user: every command they type today
  * has a twin here, backed by [[AppendLogStore]] (buffered appends +
  * merge-on-read) and [[RainStormJob]] (the 3-stage pipeline).
  *
  * {{{
  * runMain graft.GraftCli <root> create <localFile> <name>
  * runMain graft.GraftCli <root> append <localFile> <name>
  * runMain graft.GraftCli <root> get <name> <localFile>
  * runMain graft.GraftCli <root> merge <name>
  * runMain graft.GraftCli <root> ls <name>
  * runMain graft.GraftCli <root> store
  * runMain graft.GraftCli <root> rainstorm <op1> <op2> <srcFile> <destDir> <numTasks>
  * }}}
  *
  * File model: a stored "file" is rows of (ts, content) chunks — create
  * writes the initial content at ts=0, each append adds one
  * client-timestamped chunk (the reference's one-timestamp-per-append,
  * user/user.go:161-170), get returns chunks merged unique-by-ts in ts
  * order (O11). Op specs for rainstorm are [[RainStormJob.parseOp]]'s
  * (`filter_contains:X`, `filter_field_eq:i:X`, `project:i,j`,
  * `count:i`).
  */
object GraftCli {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GraftCli <root> <command> [args...]")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt, "graft-cli")
    try run(spark, args.head, args(1), args.drop(2))
    finally spark.stop()
  }

  def run(spark: SparkSession, root: String, cmd: String, rest: Seq[String]): Unit = {
    import spark.implicits._
    def store(name: String) = new AppendLogStore(spark, s"$root/$name")
    cmd match {
      case "create" =>
        val Seq(local, name) = rest.toSeq
        val content = Files.readString(Paths.get(local))
        store(name).create(Seq((0L, content)).toDF("ts", "content"))
        println(s"created $name")
      case "append" =>
        val Seq(local, name) = rest.toSeq
        val content = Files.readString(Paths.get(local))
        store(name).append(
          Seq((System.nanoTime(), content)).toDF("ts", "content"))
        println(s"appended to $name")
      case "get" =>
        val Seq(name, local) = rest.toSeq
        val chunks = store(name).read(Seq("content"))
          .select("content").as[String].collect()
        Files.writeString(Paths.get(local), chunks.mkString)
        println(s"got $name -> $local (${chunks.length} chunks)")
      case "merge" =>
        val Seq(name) = rest.toSeq
        store(name).compact(Seq("content"))
        println(s"merged $name")
      case "ls" =>
        val Seq(name) = rest.toSeq
        listFs(spark, s"$root/$name").foreach(println)
      case "store" =>
        listFs(spark, root).foreach(println)
      case "rainstorm" =>
        val Seq(op1, op2, src, dest, n) = rest.toSeq
        RainStormJob.runBatch(spark, op1, op2, src, dest, n.toInt)
        println(s"rainstorm done -> $dest")
      case other =>
        throw new IllegalArgumentException(s"unknown command '$other'")
    }
  }

  private def listFs(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq(s"(no such path: $path)")
    else fs.listStatus(p).toSeq.map { st =>
      val kind = if (st.isDirectory) "d" else "-"
      f"$kind ${st.getLen}%9d ${st.getPath.getName}"
    }
  }
}
