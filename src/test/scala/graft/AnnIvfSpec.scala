package graft

import graft.queries.TrainingDataQueries
import org.scalatest.funsuite.AnyFunSuite

/** IVF ANN: both quantizer variants return well-formed top-k, and the
  * k-means variant (not DuckDB-reproducible, hence no oracle) keeps the
  * same output contract as the oracled medoid variant. */
class AnnIvfSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  test("medoid-quantizer IVF: k results, sorted by vec_id, probe excluded") {
    val rows = TrainingDataQueries.qAnnIvf(spark, sf).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val ids = rows.map(_.getLong(0))
    assert(ids.sameElements(ids.sorted))
    assert(!ids.contains(0L))
    rows.foreach(r => assert(math.abs(r.getDouble(1)) <= 1.0001))
  }

  test("kmeans-quantizer IVF: same contract, deterministic across runs") {
    val a = TrainingDataQueries.qAnnIvf(spark, sf, useKmeans = true).collect()
    val b = TrainingDataQueries.qAnnIvf(spark, sf, useKmeans = true).collect()
    assert(a.map(_.getLong(0)).sameElements(b.map(_.getLong(0))))
    assert(a.nonEmpty && !a.map(_.getLong(0)).contains(0L))
  }

  test("medoid-selection modulus bounds the driver collect at any corpus size") {
    // expected medoid count = n/mod; must stay bounded from 10× the sf0.1
    // embeddings corpus all the way to web scale (10^12 vectors)
    for (n <- Seq(20000L, 2000000L, 1000000000L, 1000000000000L)) {
      val mod = TrainingDataQueries.medoidModulus(n)
      val expected = n.toDouble / mod
      assert(expected <= 8192.0, s"n=$n mod=$mod expected=$expected")
    }
    // exact count at 10× the sf0.1 corpus: enumerate the very predicate the
    // driver collect uses (md5(vec_id) % medoidModulus(n) == 0)
    val n = 20000L
    val mod = TrainingDataQueries.medoidModulus(n)
    val count = (0L until n).count(id =>
      java.lang.Long.remainderUnsigned(graft.core.DuckHash.md5NumberLower(id.toString), mod) == 0L)
    assert(count > 0 && count <= 8192, s"actual medoids at n=$n: $count")
  }

  test("raising nProbe widens (or keeps) the candidate pool's best score") {
    def best(nProbe: Int): Double = {
      val rows = TrainingDataQueries.qAnnIvf(spark, sf, nProbe = nProbe).collect()
      rows.map(_.getDouble(1)).max
    }
    assert(best(4) >= best(1)) // more lists probed can only improve the top score
  }
}
