package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** One shared local session per suite (guide: lazy val, not per-test). */
trait SparkSuite { self: AnyFunSuite =>
  lazy val spark: SparkSession = GraftSession.local(4, getClass.getSimpleName)

  /** Run `body` with session confs temporarily set, restoring previous
    * values (or unsetting) afterwards — shared by every spec that
    * flips optimizer/AQE knobs (SkewSpec, RuntimeFilterSpec). */
  def withConfs[T](pairs: (String, String)*)(body: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
