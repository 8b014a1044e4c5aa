package graft

import graft.queries.QualityQueries
import org.scalatest.funsuite.AnyFunSuite

/** Quality-gating operators (Gopher rules, repetition signals, CCNet
  * perplexity buckets) — hand-computed crafted cases plus invariant
  * checks on the sf0.001 corpus. Cross-engine equality with DuckDB is
  * covered by the driver's oracle gate (all three have oracleSql
  * entries). */
class QualitySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  // -------------------------------------------------------- char entropy

  test("char entropy: exact integer bits on hand-computed strings") {
    import spark.implicits._
    val d = Seq(
      (0L, "aaaa"), // one symbol: bits = 4·(ilog2(4)−ilog2(4)) = 0
      (1L, "abab"), // two × 2:   bits = 2·(2−1)+2·(2−1) = 4 → ent 1.0
      (2L, "abcd"), // four × 1:  bits = 4·(2−0) = 8 → ent 2.0
      (3L, ""),     // empty: all zeros, no div-by-zero
      (4L, "aab"),  // n=3: a:2→(1−1)=0·2, b:1→(1−0)=1 → bits 1, ent 0.3333
    ).toDF("doc_id", "text")
    val out = QualityQueries.charEntropy(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(0L) == ((4L, 1L, 0L, 0.0)))
    assert(out(1L) == ((4L, 2L, 4L, 1.0)))
    assert(out(2L) == ((4L, 4L, 8L, 2.0)))
    assert(out(3L) == ((0L, 0L, 0L, 0.0)))
    assert(out(4L) == ((3L, 2L, 1L, 0.3333)))
  }

  test("char entropy: corpus invariants (bounds, prose band)") {
    val out = QualityQueries.qCharEntropy(spark, sf).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val (n, dist, bits, ent) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(bits >= 0L && ent >= 0.0)
      // ilog2 entropy is bounded by ilog2(n) bits per char
      if (n > 0) assert(ent <= 64 - java.lang.Long.numberOfLeadingZeros(n) - 1 + 1e-9)
      assert(dist <= n)
    }
    // word-salad prose: the corpus median must sit in a prose-like band,
    // not at the repetitive floor or the random-noise ceiling
    val ents = out.map(_.getDouble(4)).sorted
    val med = ents(ents.length / 2)
    assert(med > 2.0 && med < 6.0, s"median ent $med outside prose band")
  }

  // ----------------------------------------------------------- corpus stats

  test("corpus stats: hand-computed one-row profile") {
    import spark.implicits._
    // wc: a:2, b:2, c:1 — N=5, vocab=3, hapax=1, top10 covers everything;
    // ent_bits = 2·(ilog2(5)−ilog2(2)) ×2 + 1·(ilog2(5)−ilog2(1)) = 2+2+2
    val d = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val r = QualityQueries.corpusStats(d).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getDouble(6)) == ((2L, 5L, 3L, 1L, 5L, 6L, 1.2)))
  }

  test("corpus stats: corpus invariants") {
    val r = QualityQueries.qCorpusStats(spark, sf).collect()(0)
    val (nDocs, nTok, vocab, hapax, top10, entBits, entR) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6))
    assert(nDocs == 500L && nTok > 0L)
    assert(vocab <= nTok && hapax <= vocab && top10 <= nTok)
    // integer entropy per token is bounded by ilog2(N)
    assert(entR >= 0.0 && entR <= (63 - java.lang.Long.numberOfLeadingZeros(nTok)).toDouble)
  }

  // ------------------------------------------------------------ gopher rules

  test("gopher: hand-computed columns on crafted docs incl. both augmentations") {
    import spark.implicits._
    val d = Seq(
      // doc_id 0 -> heavy symbol augmentation (0 % 4 == 0)
      (0L, "x"),
      // doc_id 1 -> light '#' augmentation (1 % 8 == 1)
      (1L, "the a to"),
      // doc_id 2 -> no augmentation
      (2L, "aa bb"),
      // doc_id 7 -> 51 words, mean length in [3,10], >=2 stopwords, no symbols
      (7L, ("the and " * 25 + "data").trim),
    ).toDF("doc_id", "text")
    val out = QualityQueries.gopherQuality(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getBoolean(6)))).toMap

    // aug "x ### ... #### ... ### ... ####": 8 words, Σlen = 1+3+3+4+3+3+3+4 = 24,
    // 1 alphabetic word, 14 '#' + 3 '...' = 17 symbols
    assert(out(0L) == ((8L, 3.0, 0.125, 0L, 2.125, false)))
    // aug "the a to #": 4 words, Σlen 3+1+2+1 = 7, 3 alpha, 3 stopwords, 1 symbol
    assert(out(1L) == ((4L, 1.75, 0.75, 3L, 0.25, false)))
    assert(out(2L) == ((2L, 2.0, 1.0, 0L, 0.0, false)))
    // 51 words (25x "the and" + "data"): Σlen = 50*3 + 4 = 154, all alpha, 50 stop
    assert(out(7L) == ((51L, math.rint(154.0 / 51 * 10000) / 10000, 1.0, 50L, 0.0, true)))
  }

  test("gopher: pass is integer-exact at the boundaries") {
    import spark.implicits._
    // 50 words of length exactly 3 -> n_words == 50 (lower bound), mean 3.0
    // (lower bound), all alpha, 50 stopwords, 0 symbols: pass
    val atBound = ("the " * 50).trim
    // 49 words: fails the word-count lower bound only
    val below = ("the " * 49).trim
    val d = Seq((3L, atBound), (7L, below)).toDF("doc_id", "text")
    val out = QualityQueries.gopherQuality(d).collect()
      .map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(out(3L) && !out(7L))
  }

  test("gopher: corpus run has both outcomes and heavy-aug docs all fail") {
    val rows = QualityQueries.qGopherQuality(spark, sf).collect()
    assert(rows.nonEmpty)
    val (p, f) = rows.partition(_.getBoolean(6))
    assert(p.nonEmpty && f.nonEmpty, "both pass and fail must occur on the corpus")
    // heavy augmentation adds 17 symbols / 7 words: at corpus doc lengths
    // (<= ~110 words) the 10% symbol bar always fails
    assert(rows.filter(_.getLong(0) % 4 == 0).forall(!_.getBoolean(6)))
  }

  // ------------------------------------------------------ repetition signals

  test("repetition: hand-computed fractions") {
    import spark.implicits._
    val d = Seq(
      (1L, "a a a b"),      // 4 tokens, 2 distinct, top word 3; bigrams aa,aa,ab -> top 2/3
      (2L, "x y z"),        // no repetition
      (3L, "w"),            // 1 token, 0 bigrams
    ).toDF("doc_id", "text")
    val out = QualityQueries.repetitionStats(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6), r.getDouble(7), r.getDouble(8)))).toMap
    assert(out(1L) == ((4L, 2L, 3L, 3L, 2L, 0.5, 0.75, 0.6667)))
    assert(out(2L) == ((3L, 3L, 1L, 2L, 1L, 0.0, 0.3333, 0.5)))
    assert(out(3L) == ((1L, 1L, 1L, 0L, 0L, 0.0, 1.0, 0.0)))
  }

  test("repetition: corpus invariants") {
    val rows = QualityQueries.qRepetitionStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "distinct <= tokens")
      assert(r.getLong(3) <= r.getLong(1), "top word count <= tokens")
      assert(r.getLong(4) == math.max(0L, r.getLong(1) - 1), "bigrams = tokens - 1 on single-line docs")
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) < 1.0)
    }
  }

  // ------------------------------------------------------- tokenizer stats

  test("oov: hand-computed against a 2-word vocab") {
    import spark.implicits._
    // counts: a=3, b/c/d=1 -> top-2 vocab (cnt desc, word asc) = {a, b}
    val d = Seq((1L, "a a b"), (2L, "a c"), (3L, "d")).toDF("doc_id", "text")
    val out = QualityQueries.oovRate(d, vocabSize = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 0L, 0.0)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((1L, 1L, 1.0)))
  }

  test("length hist: buckets are exact ilog2 ranges covering the whole corpus") {
    val rows = QualityQueries.qLengthHist(spark, sf).collect()
    assert(rows.nonEmpty)
    var total = 0L
    rows.foreach { r =>
      val (bucket, n, lo, hi) = (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))
      total += n
      assert(lo >= (1L << bucket) && hi < (1L << (bucket + 1)),
        s"bucket $bucket bounds [$lo,$hi] outside [2^$bucket, 2^${bucket + 1})")
    }
    val corpusDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total == corpusDocs, "histogram must cover every non-empty doc")
  }

  // ---------------------------------------------------------- unicode clean

  test("unicode clean: hand-computed codepoint counts and cleaned digests") {
    import spark.implicits._
    val d = Seq((2L, "abc"), (3L, "x")).toDF("doc_id", "text")
    val out = QualityQueries.unicodeClean(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // suffix = 39 codepoints; NFC composes acute+diaeresis (-2); cleanup
    // drops ZWSP + control and collapses the double space (-3)
    val eAcute = 0x00E9.toChar
    val aUmlaut = 0x00E4.toChar
    val aRing = 0x00E5.toChar
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val cleanEven = s"abc caf$eAcute n${aUmlaut}ive mixedctl double spaced"
    assert(out(2L) == ((42L, 40L, 37L, md5hex(cleanEven))))
    // odd doc adds ' a' + U+030A + 'ngstro' + U+0308 + 'm' (11 codepoints,
    // NFC composes 2 more)
    val cleanOdd = s"x caf$eAcute n${aUmlaut}ive mixedctl double spaced ${aRing}ngstr${0x00F6.toChar}m"
    assert(out(3L) == ((51L, 47L, 44L, md5hex(cleanOdd))))
  }

  test("unicode clean: corpus run — NFC always shortens by the augmented composition count") {
    val rows = QualityQueries.qUnicodeClean(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, nRaw, nNfc, nClean) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val expectedCompose = if (id % 2 == 1) 4 else 2
      assert(nRaw - nNfc == expectedCompose, s"doc $id: raw $nRaw nfc $nNfc")
      assert(nClean < nNfc)
    }
  }

  // ----------------------------------------------------------- ccnet buckets

  test("ccnet: hand-computed surprisal and tertile formula on a 3-doc corpus") {
    import spark.implicits._
    // corpus counts: cu(u)=4, cb(u,u)=2, cb(u,v)=1
    // d1 "u u u": two (u,u) bigrams, each ilog2(4)-ilog2(2)=1 -> avg 1.0
    // d2 "u v":   one (u,v) bigram, ilog2(4)-ilog2(1)=2      -> avg 2.0
    // d3 "z":     no bigrams                                  -> avg 0.0
    // rank in lang 'en' (n=3): d3 rn1 -> bucket 1, d1 rn2 -> 2, d2 rn3 -> 3
    val d = Seq(
      (1L, "u u u", "en"),
      (2L, "u v", "en"),
      (3L, "z", "en"),
    ).toDF("doc_id", "text", "lang")
    val out = QualityQueries.ccnetBuckets(d).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("en", 1, 1L, 0.0, 0.0),
      ("en", 2, 1L, 1.0, 1.0),
      ("en", 3, 1L, 2.0, 2.0)))
  }

  test("ccnet: corpus buckets partition each language into balanced tertiles") {
    val rows = QualityQueries.qCcnetBuckets(spark, sf).collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getString(0))
    byLang.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).toSet.subsetOf(Set(1, 2, 3)))
      val sizes = rs.map(_.getLong(2))
      // tertile sizes differ by at most 1
      assert(sizes.max - sizes.min <= 1)
      // bucket score ranges are ordered and non-overlapping
      val sorted = rs.sortBy(_.getInt(1))
      sorted.sliding(2).foreach {
        case Array(lo, hi) => assert(lo.getDouble(4) <= hi.getDouble(3))
        case _             =>
      }
    }
  }
}
