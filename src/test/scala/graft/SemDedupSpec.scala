package graft

import graft.core.DuckHash
import graft.queries.TrainingDataQueries
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup (q_semdedup): the DataFrame pipeline is checked against an
  * independent brute-force scalar reference — medoid selection, argmax
  * assignment, and the preferred-neighbor rule recomputed with plain
  * loops over the collected corpus — exactly the GraphSpec discipline.
  * The DuckDB oracle then re-checks the same pipeline cross-engine. */
class SemDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"
  private val Tau = 0.35

  /** (vec_id, embedding) corpus, collected once. */
  private lazy val corpus: Array[(Long, Array[Float])] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  private def cosQ(a: Array[Float], b: Array[Float]): Double =
    TrainingDataQueries.cosineQ(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(a),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(b))

  /** 6 sign-LSH band keys per vector at the corpus-sized band width —
    * the reference reproduces the candidate restriction exactly. */
  private lazy val bandBits: Int = TrainingDataQueries.semBandBits(corpus.length.toLong)
  private lazy val bandKeys: Map[Long, Array[Long]] =
    corpus.map { case (id, v) =>
      id -> Array.tabulate(6)(m => TrainingDataQueries.signSketch(
        scala.collection.immutable.ArraySeq.unsafeWrapArray(v), bandBits, m * bandBits))
    }.toMap
  private def sharesBand(a: Long, b: Long): Boolean =
    bandKeys(a).zip(bandKeys(b)).exists { case (x, y) => x == y }

  /** Brute-force reference: (vec_id -> (list_id, cent_q, is_dup, dup_of)). */
  private lazy val reference: Map[Long, (Long, Long, Boolean, Long)] = {
    val mod = math.max(31L, corpus.length / 4096L)
    val medoids = corpus.filter { case (id, _) =>
      java.lang.Long.remainderUnsigned(DuckHash.md5NumberLower(id.toString), mod) == 0L
    }
    assert(medoids.nonEmpty)
    // argmax cosine, ties -> smallest medoid id (ascending scan + strict >)
    val assigned = corpus.map { case (id, v) =>
      var best = medoids(0)._1
      var bestCos = Double.NegativeInfinity
      medoids.foreach { case (mid, mv) =>
        val c = cosQ(mv, v)
        if (c > bestCos) { bestCos = c; best = mid }
      }
      (id, best, math.floor(bestCos * 10000d + 0.5d).toLong, v)
    }
    assigned.map { case (id, list, cent, v) =>
      val preferred = assigned.filter { case (jid, jlist, jcent, _) =>
        jlist == list && jid != id && sharesBand(id, jid) &&
          (jcent < cent || (jcent == cent && jid < id))
      }.filter { case (_, _, _, jv) => cosQ(v, jv) >= Tau }
      val dupOf = preferred
        .map { case (jid, _, jcent, _) => (jcent, jid) }
        .sorted.headOption
      id -> (list, cent, dupOf.isDefined, dupOf.map(_._2).getOrElse(-1L))
    }.toMap
  }

  private lazy val result: Array[(Long, Long, Long, Boolean, Long)] =
    TrainingDataQueries.qSemDedup(spark, sf, Tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))

  test("every corpus vector appears exactly once, ordered by vec_id") {
    assert(result.length === corpus.length)
    assert(result.map(_._1).sameElements(corpus.map(_._1)))
  }

  test("pipeline matches the brute-force scalar reference row for row") {
    result.foreach { case (id, list, cent, isDup, dupOf) =>
      val (rList, rCent, rDup, rOf) = reference(id)
      assert(list === rList, s"vec $id cluster")
      assert(cent === rCent, s"vec $id centroid cosine")
      assert(isDup === rDup, s"vec $id dup flag")
      assert(dupOf === rOf, s"vec $id dup_of")
    }
  }

  test("duplicates exist and every neighborhood keeps its minimum") {
    val dups = result.filter(_._4)
    assert(dups.nonEmpty, "corpus should contain semantic duplicates at tau=0.35")
    val byId = result.map(r => r._1 -> r).toMap
    dups.foreach { case (id, list, cent, _, dupOf) =>
      val (jid, jlist, jcent, _, _) = byId(dupOf)
      assert(jid === dupOf && jlist === list, s"dup_of of $id stays in-cluster")
      assert(jcent < cent || (jcent == cent && jid < id),
        s"dup_of of $id must be preferred (lower centroid-cos, id tiebreak)")
    }
    // at least one keeper per cluster that contains any vectors
    val clusters = result.groupBy(_._2)
    clusters.foreach { case (list, rows) =>
      assert(rows.exists(!_._4), s"cluster $list must keep its neighborhood minima")
    }
  }

  test("threshold monotonicity: higher tau can only shrink the dup set") {
    val loose = TrainingDataQueries.qSemDedup(spark, sf, 0.30).collect().count(_.getBoolean(3))
    val tight = TrainingDataQueries.qSemDedup(spark, sf, 0.45).collect().count(_.getBoolean(3))
    val mid = result.count(_._4)
    assert(loose >= mid && mid >= tight)
  }

  test("banded candidates stay sub-quadratic on a clone-heavy single cluster at 10x scale") {
    // Simulate the capped-quantizer regime (>= ~127k corpus vectors, where
    // medoidModulus pins the cluster count at ~4-8k and mean cluster size
    // grows with n): ONE cluster holds the whole corpus, so only the
    // sign-LSH banding stands between pair generation and O(n^2).
    // Clone-heavy corpus: 20% true clone groups of 5 (jittered copies,
    // must collide) + 80% diverse vectors (should spread across buckets).
    val dim = 64
    def unit(seed: Long): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(dim)(r.nextFloat() * 2f - 1f)
    }
    def candidateCount(n: Int): Long = {
      val rows = (0 until n).map { i =>
        val g = i / 5
        val v: Array[Float] =
          if (g % 5 == 0) {
            val base = unit(1000000L + g)
            val j = new scala.util.Random(2000000L + i)
            base.map(x => x + (j.nextFloat() - 0.5f) * 0.01f)
          } else unit(3000000L + i)
        (i.toLong, 0L, v.toSeq)
      }
      import spark.implicits._
      val df = rows.toDF("vec_id", "list_id", "embedding")
      TrainingDataQueries.semDedupCandidates(df, TrainingDataQueries.semBandBits(n.toLong))
        .count()
    }
    val small = candidateCount(1500)
    val big = candidateCount(15000)
    // pure quadratic would grow ~100x; the width growth with n
    // (semBandBits: 8 -> 11 bits here) keeps candidate volume near-linear
    assert(big < 30L * small, s"candidate growth looks quadratic: $small -> $big at 10x")
    assert(big < 15000L * 14999L / 2L / 50L,
      s"absolute candidate volume not sub-quadratic: $big of ${15000L * 14999L / 2}")
    // recall sanity: every true clone pair inside a group is a candidate
    assert(small > 0 && big > 0)
  }
}
