package graft

import graft.queries.CurationQueries
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed-seen incremental dedup variant (the class-header scale
  * note made code): publishing the seen (h, keeper) table bucketed+sorted
  * by digest means a recurring batch join exchanges ONLY the batch side.
  * Pins:
  *   1. output identity with the inline variant (same DuckDB oracle);
  *   2. the plan: under a forced SortMergeJoin (broadcast off), the
  *      seen-side scan feeds the join with NO Exchange while the batch
  *      side has one — the whole point of paying the bucketed write once.
  */
class BucketedSeenSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  private def rowSet(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("bucketed variant output equals the inline variant") {
    val bucketed = CurationQueries.qDedupIncrBucketed(spark, sf, table = "seen_eq_test")
    val inline = CurationQueries.qDedupIncremental(spark, sf)
    assert(rowSet(bucketed) == rowSet(inline))
    assert(bucketed.count() > 0)
  }

  test("seen side joins without an Exchange; batch side shuffles to the bucket count") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force the shuffled-join shape a TB-scale seen table would take
      // (broadcast off) and keep the static plan readable (AQE off)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = CurationQueries.qDedupIncrBucketed(spark, sf, table = "seen_plan_test")
        .queryExecution.executedPlan.toString
      // the bucketed scan itself: Spark marks selected bucket count
      assert(plan.contains("SelectedBucketsCount"), s"seen scan not bucketed:\n$plan")
      // the digest join is the FIRST SortMergeJoin in the plan (the later
      // one attributes hits back to doc_ids); between the join and the
      // bucketed seen scan there must be NO Exchange, while the batch
      // (windowDigests explode) side must have exactly one
      val joinIdx = plan.indexOf("SortMergeJoin [h")
      assert(joinIdx >= 0, s"no digest SMJ:\n$plan")
      val scanIdx = plan.indexOf("SelectedBucketsCount")
      assert(scanIdx > joinIdx, s"bucketed scan should sit under the digest join:\n$plan")
      val between = plan.substring(joinIdx, scanIdx)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(between).size
      assert(exchanges == 1,
        s"expected exactly the batch-side exchange between digest SMJ and bucketed scan, got $exchanges:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
