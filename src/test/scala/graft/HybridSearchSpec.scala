package graft

import graft.queries.TrainingDataQueries
import org.scalatest.funsuite.AnyFunSuite

/** Hybrid RRF retrieval (q_hybrid_search): the DataFrame pipeline is
  * checked against an independent brute-force scalar reference — keyword
  * tf×idf ranking, quantized-cosine dense ranking, and the integer RRF
  * fusion recomputed with plain loops over the collected corpus (the
  * SemDedupSpec discipline). The DuckDB oracle re-checks cross-engine. */
class HybridSearchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"
  private val terms = Seq("hash", "join", "stream", "window", "vector")
  private val LegK = 50
  private val K = 20

  private def ilog2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)

  /** Brute-force reference fusion: doc_id -> (rank_sparse, rank_dense, fused). */
  private lazy val reference: Seq[(Long, Long, Long, Long)] = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val n = docs.length.toLong
    // sparse leg: tf×idf with integer idf, top-LegK by (score desc, id)
    val tf = docs.map { case (id, text) =>
      id -> text.toLowerCase.split("\\s+").filter(terms.contains).groupBy(identity)
        .map { case (w, a) => w -> a.length.toLong }
    }.filter(_._2.nonEmpty)
    val df = terms.map(t => t -> tf.count(_._2.contains(t)).toLong).toMap
    val scores = tf.map { case (id, m) =>
      id -> m.map { case (w, c) => c * ilog2(n * 1024L / df(w)) }.sum
    }
    val sparseRank = scores.sortBy { case (id, s) => (-s, id) }.take(LegK)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    // dense leg: quantized cosine vs probe vec 0, top-LegK by (cos_q desc, id)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    val probe = emb.find(_._1 == 0L).get._2
    val denseRank = emb.filter(_._1 != 0L)
      .map { case (id, v) =>
        id -> math.floor(TrainingDataQueries.cosineQ(v, probe) * 10000d + 0.5d).toLong
      }
      .sortBy { case (id, c) => (-c, id) }.take(LegK)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val fused = (sparseRank.keySet ++ denseRank.keySet).toSeq.map { id =>
      val rs = sparseRank.getOrElse(id, 0L)
      val rd = denseRank.getOrElse(id, 0L)
      val f = (if (rs == 0) 0L else 1000000000L / (60L + rs)) +
        (if (rd == 0) 0L else 1000000000L / (60L + rd))
      (id, rs, rd, f)
    }
    fused.sortBy { case (id, _, _, f) => (-f, id) }.take(K).sortBy(_._1)
  }

  private lazy val result: Seq[(Long, Long, Long, Long)] =
    TrainingDataQueries.qHybridSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("pipeline matches the brute-force scalar reference row for row") {
    assert(result == reference)
  }

  test("both legs contribute and ranks are sane") {
    assert(result.nonEmpty && result.length <= K)
    assert(result.exists(_._2 > 0), "some fused doc must come from the sparse leg")
    assert(result.exists(_._3 > 0), "some fused doc must come from the dense leg")
    result.foreach { case (id, rs, rd, f) =>
      assert(rs >= 0 && rs <= LegK && rd >= 0 && rd <= LegK, s"doc $id rank bounds")
      assert(rs > 0 || rd > 0, s"doc $id must appear in at least one leg")
      val expect = (if (rs == 0) 0L else 1000000000L / (60L + rs)) +
        (if (rd == 0) 0L else 1000000000L / (60L + rd))
      assert(f == expect, s"doc $id fused_score recomputation")
    }
    // a doc ranked high in BOTH legs must outscore one ranked in a single leg
    val both = result.filter(r => r._2 > 0 && r._3 > 0)
    val single = result.filter(r => r._2 == 0 || r._3 == 0)
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_._4).max > single.map(_._4).min)
  }
}
