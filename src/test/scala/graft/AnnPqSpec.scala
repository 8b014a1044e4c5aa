package graft

import graft.queries.TrainingDataQueries
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization ANN: crafted-corpus behavior (probe clones must
  * win with exact cosine 1.0 and the minimal ADC) plus structural checks
  * on the sf0.001 corpus. Cross-engine equality with DuckDB is covered by
  * the driver's oracle gate (q_ann_pq has an oracleSql entry). */
class AnnPqSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  /** 200-vector 64-dim corpus: id 0 = probe, ids 1..9 = exact probe
    * clones (quantize-identical -> identical PQ codes -> minimal ADC,
    * re-rank cosine exactly 1.0), ids 10..199 deterministic pseudo-random
    * far vectors. md5 donor ids in [0,200) under mod 31: 123, 126, 139,
    * 146, 172 — the codebook is non-empty by construction. */
  private def craftedCorpus() = {
    import spark.implicits._
    def probe(i: Int): Float = (((i % 5) - 2) * 0.2).toFloat
    def far(id: Long, i: Int): Float = ((((id * 31 + i * 17) % 11) - 5) * 0.18).toFloat
    val rows = (0L until 200L).map { id =>
      val v = (0 until 64).map(i => if (id <= 9) probe(i) else far(id, i))
      (id, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("pq: probe clones dominate the result with cosine 1.0 and minimal ADC") {
    val out = TrainingDataQueries.annPq(craftedCorpus(), k = 10, m = 8, shortlist = 40).collect()
    assert(out.length == 10)
    // sorted by vec_id (presentation order)
    assert(out.map(_.getLong(0)).toSeq == out.map(_.getLong(0)).sortBy(identity).toSeq)
    val byId = out.map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // all nine clones must be in the top-10: identical codes give them the
    // minimal possible ADC (they cannot be cut from shortlist-40), and the
    // exact re-rank scores them cosine 1.0
    (1L to 9L).foreach { id =>
      assert(byId.contains(id), s"clone $id missing from PQ top-k")
      assert(byId(id)._2 == 1.0)
    }
    val cloneAdc = byId(1L)._1
    assert((2L to 9L).forall(byId(_)._1 == cloneAdc), "identical vectors must share one ADC")
    assert(out.map(_.getLong(1)).min == cloneAdc, "clones carry the minimal ADC in the result")
  }

  test("pq: ADC is zero for clones iff the probe is its own best codeword set") {
    // clones share the probe's codes, so their ADC equals the probe's
    // self-ADC: sum over subspaces of d(probe_sub, nearest codeword_sub),
    // which is 0 only if some donor equals the probe — donors are far
    // vectors here, so ADC must be > 0 (guards against a degenerate
    // all-zero distance table)
    val out = TrainingDataQueries.annPq(craftedCorpus(), k = 10, m = 8, shortlist = 40).collect()
    assert(out.map(_.getLong(1)).forall(_ > 0L))
  }

  test("pq: corpus run is structurally sound at sf0.001") {
    val out = TrainingDataQueries.qAnnPq(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(0)).distinct.length == 10)
    assert(!out.map(_.getLong(0)).contains(0L), "probe must be excluded")
    out.foreach { r =>
      assert(r.getLong(1) >= 0L)
      assert(r.getDouble(2) >= -1.0001 && r.getDouble(2) <= 1.0001)
    }
  }
}
