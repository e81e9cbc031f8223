package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The driver-facing output contract, enforced at analysis time.
  *
  * Round 6 lost 4 of 136 driver rows to SHAPE, not semantics: two
  * queries whose DuckDB oracle emitted DECIMAL128 where Spark emits
  * BIGINT (windowed SUM promotion), and two whose Spark output carried
  * an `array<double>` column the driver's pandas sorter cannot hash
  * (`TypeError: unhashable type: 'numpy.ndarray'`). All four were
  * value-correct; the binding instrument still failed them. This spec
  * pins the contract on the Spark side so the class of miss cannot
  * recur silently:
  *
  *  1. every `SparkEntry.queries` result schema contains ONLY scalar
  *     (atomic) column types — no array/map/struct anywhere;
  *  2. every query key has an `oracleSql` twin (the weaker rows-only
  *     driver check is never silently entered);
  *  3. no oracle key is orphaned (SQL for a query that doesn't exist).
  *
  * The DuckDB-side dtype strictness (DECIMAL128 vs int64) is enforced
  * by `dev/check_oracle.py`, which canonicalises arrow dtypes into the
  * classes the driver's pandas hash distinguishes and fails on any
  * mismatch — together the two gates replicate the driver instrument.
  */
class OutputContractSpec extends AnyFunSuite with SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def scalarOk(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _ => true
  }

  test("every query output schema is scalar-only (driver sorter can hash it)") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      // .schema resolves most plans at analysis time without executing
      // them — but NOT uniformly: the streaming family (x27+, p2) runs
      // its feed + start()/awaitTermination inside the query function
      // before a DataFrame exists, and s12 runs its full Lloyd loop.
      // The sf0.001 inputs keep those executions cheap (~seconds); the
      // contract deliberately exercises the real builder path rather
      // than a declared-schema registry that could drift from it.
      val schema = fn(spark, sf).schema
      schema.fields.collect {
        case f if !scalarOk(f.dataType) => s"$name.${f.name}: ${f.dataType.sql}"
      }
    }
    assert(bad.isEmpty, s"non-scalar output columns (driver-red by shape): ${bad.mkString(", ")}")
  }

  test("every query has an oracle twin and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracleSql: ${(q -- o).toSeq.sorted.mkString(", ")}")
    assert((o -- q).isEmpty, s"orphaned oracleSql keys: ${(o -- q).toSeq.sorted.mkString(", ")}")
  }

  test("no duplicate query keys across families (later map entries silently win)") {
    val families = Seq(
      "Reference" -> queries.ReferenceQueries.queries.keySet,
      "Extension" -> queries.ExtensionQueries.queries.keySet,
      "Llm" -> queries.LlmQueries.queries.keySet,
      "Streaming" -> streaming.StreamingQueries.queries.keySet,
      "Text" -> queries.TextQueries.queries.keySet,
      "Dedup" -> queries.DedupQueries.queries.keySet,
      "Ann" -> queries.AnnQueries.queries.keySet,
      "Multimodal" -> queries.MultimodalQueries.queries.keySet,
      "ExtendedRelational" -> queries.ExtendedRelationalQueries.queries.keySet,
      "Function" -> queries.FunctionQueries.queries.keySet,
      "Pipeline" -> queries.PipelineQueries.queries.keySet,
      "SqlSurface" -> queries.SqlSurfaceQueries.queries.keySet)
    val dups = families.flatMap { case (fam, ks) => ks.map(_ -> fam) }
      .groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty, s"duplicate keys: ${dups.map { case (k, fs) => s"$k in ${fs.map(_._2).mkString("+")}" }.mkString("; ")}")
  }
}
