package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** One shared local session per suite (guide: lazy val, not per-test). */
trait SparkSuite { self: AnyFunSuite =>
  lazy val spark: SparkSession = GraftSession.local(4, getClass.getSimpleName)
}
