package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ReferenceOps, Salting}

class SaltingEnvelopeSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("salted aggregation equals direct aggregation on skewed data") {
    // 90% of rows share one hot key — the shape salting exists for
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(5000)(
      if (rnd.nextInt(10) < 9) ("hot", rnd.nextDouble())
      else (s"k${rnd.nextInt(50)}", rnd.nextDouble()))
    val df = rows.toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("cnt"))
      .orderBy("k").as[(String, Long)].collect().toSeq
    val salted = Salting.saltedGroupCount(Seq("k"))(df)
      .orderBy("k").as[(String, Long)].collect().toSeq
    assert(salted == direct)
    val directSum = df.groupBy("k").agg(sum("v").as("sum_v"))
      .orderBy("k").as[(String, Double)].collect().toMap
    val saltedSum = Salting.saltedGroupSum(Seq("k"), "v")(df)
      .orderBy("k").as[(String, Double)].collect().toMap
    // double addition order differs between the one- and two-phase
    // plans; compare within float tolerance
    assert(directSum.keySet == saltedSum.keySet)
    directSum.foreach { case (k, v) =>
      assert(math.abs(saltedSum(k) - v) < 1e-9 * math.max(1.0, math.abs(v)), k)
    }
  }

  test("Transform envelope matches probe 3.7 byte-for-byte") {
    val batch = Seq(
      "-88.2,40.1,1001,Stop,30x30,None,Punched Telespar,2005,Warning,none",
      "-88.3,40.2,1002,Yield,36x36,None,Unpunched Telespar,2006,Regulatory,none",
      "-88.4,40.3,1003,Speed,24x24,None,Square Post,2007,Warning,Punched note here",
      "-88.5,40.4,1004,Stop2,30x30,None,Telespar Punched,2008,Other,none",
      "-88.6,40.5,1005,Warn,12x18,None,Punched TelesparX,2009,Warning,none",
      "-88.7,40.6,1006,Warn2,12x18,None,xPunched Telespar,2010,Stop,none")
    val df = batch.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("line_no", "value")
    // the projection keeping the order column alongside (projectFields
    // itself is line-only, mirroring the binary's stdin/stdout contract)
    val projected = df
      .withColumn("parts", split(col("value"), ",", -1))
      .filter(size(col("parts")) >= 4)
      .select(col("line_no"),
        concat_ws(",", get(col("parts"), lit(2)), get(col("parts"), lit(3))).as("value"))
    val env = ReferenceOps.envelopeTransform("line_no")(projected)
    // probe 3.7 expected wire string
    val got = env.as[String].head()
    assert(got ==
      """{"Type":"Transform","Data":"1001,Stop\n1002,Yield\n1003,Speed\n1004,Stop2\n1005,Warn\n1006,Warn2"}""")
  }

  test("Aggregate envelope matches probe 3.8 byte-for-byte (sorted keys)") {
    val batch = Seq(
      "-88.2,40.1,1001,Stop,30x30,None,Punched Telespar,2005,Warning,none",
      "-88.3,40.2,1002,Yield,36x36,None,Unpunched Telespar,2006,Regulatory,none",
      "-88.4,40.3,1003,Speed,24x24,None,Square Post,2007,Warning,Punched note here",
      "-88.5,40.4,1004,Stop2,30x30,None,Telespar Punched,2008,Other,none",
      "-88.6,40.5,1005,Warn,12x18,None,Punched TelesparX,2009,Warning,none",
      "-88.7,40.6,1006,Warn2,12x18,None,xPunched Telespar,2010,Stop,none").toDF("value")
    val got = ReferenceOps.envelopeAggregate(
      ReferenceOps.groupCountField(8)(batch)).as[String].head()
    assert(got ==
      """{"Type":"Aggregate","Data":"{\"Other\":1,\"Regulatory\":1,\"Stop\":1,\"Warning\":3}"}""")
  }

  test("leader console line matches Go's sorted map rendering (O8)") {
    val counts = Seq(("Warning", 3L), ("Other", 1L), ("Stop", 1L)).toDF("key", "cnt")
    val got = ReferenceOps.leaderConsoleLine(counts).as[String].head()
    assert(got == "map[Other:1 Stop:1 Warning:3]")
  }
}
