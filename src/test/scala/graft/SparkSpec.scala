package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM, one session). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = graft.spark.Sessions.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sf: String = TestSpark.sf

  /** Formatted physical plan for plan-shape assertions. */
  def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString()

  def optimized(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString()
}

/** Contract guards over the whole driver surface — catches a query
  * registered without its oracle (which would silently degrade the
  * correctness gate to a rows-only check for that operator).
  */
class SparkEntryContractSpec extends SparkSpec {

  /** The only queries ALLOWED to ship without a DuckDB oracle, each
    * with the reason pinned here. EMPTY since round 4: every query on
    * the surface carries a hash-compared oracle (the last holdout,
    * q_media_features, gained one when the decode stub moved to an
    * engine-portable modular hash rule).
    */
  val rowsOnlyAllowed = Set.empty[String]

  test("every query has an oracle unless explicitly allowed rows-only") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    val missing = q -- o -- rowsOnlyAllowed
    assert(missing.isEmpty,
      s"queries silently lacking oracles: ${missing.toSeq.sorted.mkString(", ")}")
    val stale = rowsOnlyAllowed -- q
    assert(stale.isEmpty, s"rows-only allowance for unknown queries: $stale")
    val shadowed = rowsOnlyAllowed & o
    assert(shadowed.isEmpty,
      s"queries both allowed rows-only AND carrying an oracle: $shadowed")
  }
}
