package graft

import graft.queries.TrainingDataQueries
import org.scalatest.funsuite.AnyFunSuite

/** Sparse keyword retrieval invariants (cross-engine exactness is the
  * DuckDB oracle's job; this pins the ranking semantics). */
class KeywordSearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"
  private val terms = Seq("hash", "join", "stream", "window", "vector")

  test("top-k ranking: bounded, ordered, tie-broken, and every hit really contains a term") {
    val rows = TrainingDataQueries.qKeywordSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length <= 20 && rows.nonEmpty)
    // (score desc, doc_id asc) order
    val key = rows.map { case (id, s, _) => (-s, id) }
    assert(key.sameElements(key.sorted))
    assert(rows.forall { case (_, s, hit) => s >= 0 && hit >= 1 && hit <= terms.size })
    // returned docs really contain at least one query term
    val ids = rows.map(_._1).toSet
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .where(org.apache.spark.sql.functions.col("doc_id").isin(ids.toSeq: _*))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(ids.forall(id =>
      texts(id).toLowerCase.split("\\s+").exists(terms.contains)))
  }

  test("bm25: scalar reference on the corpus — same formula, same micro-quantization") {
    val rows = TrainingDataQueries.qBm25(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length <= 20 && rows.nonEmpty)
    // scalar recomputation over the raw corpus
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
      .toMap
    val n = docs.size.toLong
    val dl = docs.map { case (id, ws) => id -> ws.length.toLong }
    val avgdl = dl.values.sum.toDouble / n
    val tf: Map[(Long, String), Long] = docs.toSeq.flatMap { case (id, ws) =>
      ws.filter(terms.contains).groupBy(identity).map { case (w, g) => (id, w) -> g.length.toLong }
    }.toMap
    val df = tf.keys.groupBy(_._2).map { case (w, ks) => w -> ks.size.toLong }
    def ilog2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val idf = df.map { case (w, d) => w -> ilog2(n * 1024L / d) }
    val want = tf.toSeq.map { case ((id, w), f) =>
      val t = idf(w).toDouble * (f.toDouble * 2.2d) /
        (f.toDouble + 1.2d * (0.25d + 0.75d * (dl(id).toDouble / avgdl)))
      id -> math.floor(t * 1000000d + 0.5d).toLong
    }.groupBy(_._1).map { case (id, ts) => (id, ts.map(_._2).sum, ts.size.toLong) }
      .toSeq.sortBy { case (id, s, _) => (-s, id) }.take(20).sortBy(_._1)
    assert(rows.toSeq == want, s"\ngot  ${rows.toSeq}\nwant $want")
    // length normalization is live: a doc's bm25 per-term score saturates
    // (score_q strictly below idf * (k1+1) * 1e6 * n_terms upper bound)
    rows.foreach { case (_, s, hits) =>
      assert(s < hits * (10L * 2200000L), "saturation bound violated")
    }
  }
  test("phrase search: crafted corpus with known occurrence counts") {
    import spark.implicits._
    // doc 1's tokens 6-8 define the probe phrase: "fff ggg hhh"
    val d = Seq(
      (1L, "aaa bbb ccc ddd eee fff ggg hhh iii jjj"),
      // two occurrences, one straddling a repeat
      (2L, "xxx fff ggg hhh yyy fff ggg hhh zzz"),
      // near miss: middle word differs
      (3L, "fff qqq hhh fff ggg qqq"),
      // phrase at the very start and very end
      (4L, "fff ggg hhh"),
      (5L, "ppp fff ggg"),  // incomplete tail: no hit
    ).toDF("doc_id", "text")
    val got = TrainingDataQueries.phraseSearch(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 4L -> 1L), got.toString)
  }

  test("phrase search: corpus query hits its own origin doc") {
    val got = TrainingDataQueries.qPhraseSearch(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.getOrElse(1L, 0L) >= 1L, s"doc 1 must contain its own phrase: $got")
  }
}
