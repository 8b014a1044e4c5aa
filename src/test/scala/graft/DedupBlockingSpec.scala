package graft

import graft.core.DuckHash
import graft.queries.TrainingDataQueries
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** DuckDB-reproducibility anchors + blocking-scheme scale properties for
  * the dedup/ANN family (VERDICT r1 items 1 and 4). */
class DuckHashSpec extends AnyFunSuite {

  test("md5NumberLower/Upper match DuckDB md5_number_lower/upper") {
    // pinned against DuckDB v1.0: SELECT md5_number_lower('abc'), md5_number_upper('abc')
    assert(java.lang.Long.toUnsignedString(DuckHash.md5NumberLower("abc")) == "8250560606382298838")
    assert(java.lang.Long.toUnsignedString(DuckHash.md5NumberUpper("abc")) == "12704604231530709392")
    // SELECT md5_number_upper('the')
    assert(java.lang.Long.toUnsignedString(DuckHash.md5NumberUpper("the")) == "15809492726819112079")
    // empty string (digest d41d8cd98f00b204e9800998ecf8427e)
    assert(java.lang.Long.toUnsignedString(DuckHash.md5NumberLower("")) == "9098107892288553193")
    assert(java.lang.Long.toUnsignedString(DuckHash.md5NumberUpper("")) == "338333539836370388")
  }

  test("thread-local digest is reusable (no cross-call state)") {
    val a = DuckHash.md5NumberLower("hello")
    DuckHash.md5NumberUpper("interleaved")
    assert(DuckHash.md5NumberLower("hello") == a)
  }

  test("quantize is floor(v*2^20 + 0.5) with exact float->double promotion") {
    assert(TrainingDataQueries.quantize(0.0f) == 0L)
    assert(TrainingDataQueries.quantize(1.0f) == 1048576L)
    assert(TrainingDataQueries.quantize(-1.0f) == -1048576L)
    // floor(x + 0.5) tie behavior: -2.5/2^20 is exactly representable;
    // floor(-2.5 + 0.5) = -2 (matches DuckDB floor(v*1048576 + 0.5))
    assert(TrainingDataQueries.quantize(-2.5f / 1048576.0f) == -2L)
    assert(TrainingDataQueries.quantize(2.5f / 1048576.0f) == 3L)
  }
}

class DedupBlockingSpec extends AnyFunSuite {

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("C(6,3) simhash block keys: exact recall at hamming <= 3 (pigeonhole)") {
    val rnd = new Random(7)
    for (_ <- 0 until 2000) {
      val sim = rnd.nextLong()
      // corrupt 0..3 random bits
      var other = sim
      val flips = rnd.nextInt(4)
      for (_ <- 0 until flips) other ^= (1L << rnd.nextInt(64))
      assert(hamming(sim, other) <= 3)
      val ka = TrainingDataQueries.simhashBlockKeys(sim).toSet
      val kb = TrainingDataQueries.simhashBlockKeys(other).toSet
      assert(ka.intersect(kb).nonEmpty,
        s"pair within hamming 3 missed by blocking: $sim vs $other")
    }
  }

  test("C(6,3) block keys embed the combo id (no cross-combo collisions)") {
    val keys = TrainingDataQueries.simhashBlockKeys(-1L) // all blocks = all-ones
    assert(keys.length == 20)
    assert(keys.distinct.length == 20) // same block VALUES, distinct combo ids
  }

  test("blocking stays sub-quadratic on a skewed corpus (shared 16-bit prefix)") {
    // adversarial for the round-1 scheme: every sim shares the low 16 bits,
    // so naive 16-bit banding puts all n docs in ONE bucket (n^2/2 pairs).
    // The C(6,3) keys include >= 22 bits drawn from the other blocks, so
    // bucket sizes stay tiny.
    val rnd = new Random(11)
    val n = 2000
    val sims = Array.fill(n)((rnd.nextLong() & ~0xffffL) | 0xabcdL)
    val bucketSizes = sims.toSeq
      .flatMap(s => TrainingDataQueries.simhashBlockKeys(s))
      .groupBy(identity).map(_._2.size)
    val candidatePairs = bucketSizes.map(sz => sz.toLong * (sz - 1) / 2).sum
    val naivePairs = n.toLong * (n - 1) / 2 // one shared 16-bit bucket
    // random-sim corpus: expected bucket collisions are ~0; allow slack
    assert(candidatePairs < naivePairs / 100,
      s"candidate pairs $candidatePairs not sub-quadratic (naive $naivePairs)")
  }

  test("multi-probe key set == sketch-hamming <= 1 ball") {
    val bits = 16
    val probe = 0xbeefL & ((1L << bits) - 1)
    val keys = (probe +: (0 until bits).map(i => probe ^ (1L << i))).toSet
    val ball = (0L until (1L << bits)).filter(s => hamming(s, probe) <= 1).toSet
    assert(keys == ball)
  }

  test("signSketch is deterministic and uses md5-parity weights") {
    val v = Array.tabulate(64)(i => (math.sin(i) * 0.3).toFloat).toSeq
    val a = TrainingDataQueries.signSketch(v, 16, 0)
    assert(a == TrainingDataQueries.signSketch(v, 16, 0))
    // different plane offsets give different (independent) sketches
    val b = TrainingDataQueries.signSketch(v, 16, 16)
    assert(a != b)
    // 16-bit sketch stays within range
    assert((a & ~0xffffL) == 0L)
  }

  test("simhash64 word hashing matches md5_number_upper composition") {
    // one word -> its bit pattern IS the word hash thresholded at count 1
    val h = DuckHash.md5NumberUpper("solo")
    val sim = TrainingDataQueries.simhash64("solo")
    (0 until 64).foreach { b =>
      val bit = (h >>> b) & 1L
      assert(((sim >>> b) & 1L) == bit, s"bit $b")
    }
  }
}
