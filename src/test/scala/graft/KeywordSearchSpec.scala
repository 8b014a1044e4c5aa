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
}
