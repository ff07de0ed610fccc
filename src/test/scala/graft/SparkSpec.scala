package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session: one per suite, lazily built. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("4")
}
