package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() returns rows; every registered query has
  * either an oracle or is deliberately rows-only; oracle keys ⊆ queries. */
class EntrySmokeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("entry() yields rows on sf0.001") {
    val n = SparkEntry.entry(spark).count()
    assert(n > 0)
  }

  test("oracleSql keys are a subset of queries, with matching column names enforced by Verify") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os.diff(qs)}")
    assert(qs.size >= 30)
    assert(os.size >= 19)
  }

  test("every query runs at sf0.001 (cheap smoke, no oracle compare)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
