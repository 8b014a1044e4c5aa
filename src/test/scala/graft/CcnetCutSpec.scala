package graft

import graft.queries.QualityQueries
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r4 #3: the CCNet bucket scale path (`cutAssign = true` —
  * tertile cut values from the bounded distinct-score histogram,
  * broadcast, map-only assign) must agree with the exact per-language
  * rank window whenever the two tertile boundary values are unique.
  * This spec pins:
  *   1. per-row bucket agreement on a synthetic corpus with all-unique
  *      scores (three languages, sizes 7/5/1 — none divisible by 3);
  *   2. per-row bucket agreement end-to-end on the real sf0.001 corpus
  *      (whose lmScore boundary values are unique — asserted, not
  *      assumed);
  *   3. the ONLY divergence mode: a duplicated boundary value, where the
  *      rank window splits the duplicates across buckets by doc_id and
  *      the cut assign keeps equal scores together (the defensible
  *      at-scale semantics — bucket is a function of the score).
  */
class CcnetCutSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  private def buckets(scored: org.apache.spark.sql.DataFrame, cut: Boolean): Map[Long, Int] =
    QualityQueries.ccnetAssign(scored, cutAssign = cut)
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("cut-assign equals exact window on unique scores (n % 3 != 0)") {
    import spark.implicits._
    val rows =
      (1 to 7).map(i => (i.toLong, i * 1.5, "en")) ++      // n=7: tertiles 3/2/2
        (10 to 14).map(i => (i.toLong, 100.0 - i, "de")) ++ // n=5: tertiles 2/2/1
        Seq((20L, 42.0, "fr"))                              // n=1: single bucket 1
    val scored = rows.toDF("doc_id", "avg_bits_r", "lang")
    val exact = buckets(scored, cut = false)
    val cut = buckets(scored, cut = true)
    assert(exact == cut)
    // and the exact formula's tertile sizes are what CCNet prescribes
    val en = exact.filter(_._1 <= 7L).values.toSeq.sorted
    assert(en == Seq(1, 1, 1, 2, 2, 3, 3))
    assert(exact(20L) == 1)
  }

  test("cut-assign equals exact window on the sf0.001 corpus (unique-boundary langs)") {
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val scored = graft.queries.CurationQueries.lmScore(d)
      .join(d.select(col("doc_id"), col("lang")), "doc_id")
    // The exact window (score, doc_id tiebreak) only disagrees with a
    // score-functional assignment where a BOUNDARY score is duplicated —
    // which the real corpus does contain. So: (a) full agreement on every
    // language whose boundaries are unique (must be a non-empty set, or
    // the test is vacuous); (b) on the remaining languages, every
    // divergent doc sits exactly on a duplicated-boundary score.
    val exactAssigned = QualityQueries.ccnetAssign(scored, cutAssign = false).cache()
    val dupBoundary = exactAssigned
      .groupBy(col("lang"), col("avg_bits_r"))
      .agg(countDistinct(col("bucket")).as("nb"))
      .where(col("nb") > 1)
      .select(col("lang"), col("avg_bits_r")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    val dupLangs = dupBoundary.map(_._1)
    val meta = scored.select("doc_id", "lang", "avg_bits_r").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    val cleanLangDocs = meta.collect { case (id, (l, _)) if !dupLangs.contains(l) => id }.toSet
    assert(cleanLangDocs.nonEmpty, "every language has a duplicated boundary — vacuous corpus")
    val exact = buckets(scored, cut = false)
    val cut = buckets(scored, cut = true)
    cleanLangDocs.foreach(id => assert(exact(id) == cut(id), s"doc $id in a unique-boundary lang"))
    exact.keys.filterNot(cleanLangDocs).foreach { id =>
      if (exact(id) != cut(id))
        assert(dupBoundary.contains(meta(id)),
          s"doc $id diverged but is not on a duplicated boundary score (${meta(id)})")
    }
    exactAssigned.unpersist()
  }

  test("divergence mode pinned: duplicated boundary value") {
    import spark.implicits._
    // n=3, scores (1.0, 2.0, 2.0): exact rank puts doc 2 in bucket 2 and
    // doc 3 in bucket 3 (doc_id tiebreak); the cut path computes c1=1.0,
    // c2=2.0 and puts BOTH equal-scored docs in bucket 2.
    val scored = Seq((1L, 1.0, "en"), (2L, 2.0, "en"), (3L, 2.0, "en"))
      .toDF("doc_id", "avg_bits_r", "lang")
    val exact = buckets(scored, cut = false)
    val cut = buckets(scored, cut = true)
    assert(exact == Map(1L -> 1, 2L -> 2, 3L -> 3))
    assert(cut == Map(1L -> 1, 2L -> 2, 3L -> 2))
  }

  test("cut path plan: no per-document window, cuts broadcast") {
    import spark.implicits._
    val scored = (1 to 100).map(i => (i.toLong, i * 1.0, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "avg_bits_r", "lang")
    val plan = QualityQueries.ccnetAssign(scored, cutAssign = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"cut table should broadcast:\n$plan")
  }
}
