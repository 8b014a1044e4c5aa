package graft

import graft.queries.CurationQueries
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The last two prose-only scale paths made code (the r3 semdedup / r4
  * ccnet pattern): sequence packing as a two-level parallel prefix scan
  * and domain capping behind a salted per-bucket pre-top-cap. Both are
  * EXACT — identical rows to their single-window shapes by construction
  * (monotone group ids compose prefix sums; a global top-cap winner is a
  * winner of its own salt bucket) — so the driver oracle checks the scale
  * path itself. This spec pins:
  *   1. flag-on == flag-off row sets on the real sf0.001 corpus;
  *   2. the same on skew-shaped synthetics (one dominant source; group
  *      edges straddled, groupSize far below the corpus span);
  *   3. the plan shapes: pack's per-row window partitions by (source, grp)
  *      and the offset rejoin exists; domain cap runs two rank windows,
  *      the first salted.
  */
class PackCapScaleSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  private def rowSet(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  // ------------------------------------------------------------- packing

  test("pack: grouped two-level scan equals single window on sf0.001") {
    // groupSize 64 ≪ the corpus doc_id span, so offsets really compose
    val grouped = CurationQueries.qPackSequences(spark, sf, grouped = true, groupSize = 64L)
    val single = CurationQueries.qPackSequences(spark, sf, grouped = false)
    assert(rowSet(grouped) == rowSet(single))
  }

  test("pack: one dominant source, docs straddling group edges") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("packscale").toString
    // 400 docs in ONE source with ragged token counts; doc_ids dense so
    // groupSize=8 yields 50 groups; token counts prime-ish so bins land
    // off group boundaries (cut-straddle must cross group edges too)
    val docs = (0 until 400).map { i =>
      val words = Seq.fill(3 + (i * 7) % 23)("w").mkString(" ")
      (i.toLong, words, "en", "hot.example", words.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val grouped = CurationQueries.qPackSequences(spark, tmp, binTokens = 64,
      grouped = true, groupSize = 8L)
    val single = CurationQueries.qPackSequences(spark, tmp, binTokens = 64,
      grouped = false)
    assert(rowSet(grouped) == rowSet(single))
    // the corpus is built to exercise straddling — assert non-vacuous
    assert(grouped.where("spans_cut").count() > 0)
  }

  test("pack: grouped plan partitions the per-row window by (source, grp)") {
    val plan = CurationQueries.qPackSequences(spark, sf, grouped = true, groupSize = 64L)
      .queryExecution.executedPlan.toString
    // the row-level running sum must be keyed by grp (parallel within a
    // source), and the offsets must come back through a keyed join
    assert(plan.contains("grp"), s"no group key in plan:\n$plan")
    val windowSpecs = "windowspecdefinition\\(".r.findAllIn(plan).size
    assert(windowSpecs >= 2, s"expected local + offset windows:\n$plan")
  }

  // ---------------------------------------------------------- domain cap

  test("domain cap: salted prefilter equals plain window on sf0.001") {
    val pre = CurationQueries.qDomainCap(spark, sf, prefilter = true)
    val plain = CurationQueries.qDomainCap(spark, sf, prefilter = false)
    assert(rowSet(pre) == rowSet(plain))
  }

  test("domain cap: dominant domain with duplicate n_chars ties") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("capscale").toString
    // 2000 docs in one hot domain (many ties on n_chars so the doc_id
    // tiebreak is load-bearing), 10 in a cold one; cap 15 < hot size
    val docs = ((0 until 2000).map { i =>
      (i.toLong, "t", "en", "hot.example", (i % 17).toLong)
    } ++ (3000 until 3010).map { i =>
      (i.toLong, "t", "en", "cold.example", (i % 5).toLong)
    }).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pre = CurationQueries.qDomainCap(spark, tmp, prefilter = true)
    val plain = CurationQueries.qDomainCap(spark, tmp, prefilter = false)
    assert(rowSet(pre) == rowSet(plain))
    assert(pre.where("source = 'hot.example'").count() == 15)
    assert(pre.where("source = 'cold.example'").count() == 10)
  }

  test("domain cap: prefilter plan runs a salted rank before the final rank") {
    val plan = CurationQueries.qDomainCap(spark, sf, prefilter = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("salt"), s"no salted pre-rank in plan:\n$plan")
    val rowNums = "row_number\\(\\)".r.findAllIn(plan).size
    assert(rowNums >= 2, s"expected salted + final rank windows:\n$plan")
  }
}
