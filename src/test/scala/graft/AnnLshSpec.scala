package graft

import graft.queries.TrainingDataQueries
import org.scalatest.funsuite.AnyFunSuite

/** Multi-probe LSH ANN (q_ann_lsh): at gate corpus sizes the probed
  * 17-bucket ball of the 2^16-bucket space is empty — the driver oracle's
  * 0-row match is the CORRECT sparse answer, but vacuous as a behavior
  * check. This spec makes the behavior non-vacuous: a corpus seeded with
  * exact clones of the probe (same sketch → same bucket) must surface
  * them, and the whole pipeline must equal a scalar reference that scans
  * the sketch-hamming ≤ 1 ball brute-force. */
class AnnLshSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"
  private val Bits = 16
  private val K = 10

  private def cosQ(a: Seq[Float], b: Seq[Float]): Double =
    TrainingDataQueries.cosineQ(a, b)

  /** sf0.001 corpus + 3 exact clones of the probe vector under fresh ids. */
  private lazy val seeded = {
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val rows = base.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val probe = rows.find(_._1 == 0L).get._2
    val maxId = rows.map(_._1).max
    import spark.implicits._
    val clones = Seq(maxId + 1, maxId + 2, maxId + 3).map(id => (id, probe))
    (rows.toSeq ++ clones, base.union(clones.toDF("vec_id", "embedding")))
  }

  test("probe-bucket neighbors are found with cos_r = 1.0") {
    val (_, df) = seeded
    val got = TrainingDataQueries.annLsh(df, K).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val cloneIds = seeded._1.map(_._1).sorted.takeRight(3).toSet
    assert(cloneIds.subsetOf(got.map(_._1).toSet),
      s"clones $cloneIds must be surfaced, got ${got.map(_._1).toSeq}")
    got.filter(r => cloneIds(r._1)).foreach { case (id, c) =>
      assert(c == 1.0, s"clone $id cosine")
    }
  }

  test("pipeline equals the scalar hamming<=1-ball reference row for row") {
    val (rows, df) = seeded
    val probe = rows.find(_._1 == 0L).get._2
    val probeSketch = TrainingDataQueries.signSketch(probe, Bits, 0)
    val ball = (0 until Bits).map(i => probeSketch ^ (1L << i)).toSet + probeSketch
    val reference = rows
      .filter { case (id, v) =>
        id != 0L && ball(TrainingDataQueries.signSketch(v, Bits, 0))
      }
      .map { case (id, v) => // HALF_UP to match Spark's round()
        (id, BigDecimal(cosQ(v, probe))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, c) => (-c, id) }.take(K).sortBy(_._1)
    val got = TrainingDataQueries.annLsh(df, K).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == reference)
  }

  test("the unseeded gate corpus really has an empty probed ball (oracle 0-row is correct)") {
    val got = TrainingDataQueries.qAnnLsh(spark, sf).collect()
    val rows = seeded._1.dropRight(3)
    val probe = rows.find(_._1 == 0L).get._2
    val probeSketch = TrainingDataQueries.signSketch(probe, Bits, 0)
    val ball = (0 until Bits).map(i => probeSketch ^ (1L << i)).toSet + probeSketch
    val expected = rows.count { case (id, v) =>
      id != 0L && ball(TrainingDataQueries.signSketch(v, Bits, 0))
    }
    assert(got.length == expected, "pipeline row count == scalar ball count")
  }
}
