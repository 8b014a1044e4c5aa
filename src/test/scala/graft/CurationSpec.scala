package graft

import graft.queries.CurationQueries
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-curation operators (PII redaction, decontamination, stratified
  * sampling, substring dedup, incremental dedup, sequence packing) — unit
  * behavior on crafted inputs plus shape/invariant checks on the sf0.001
  * corpus. Cross-engine equality with DuckDB is covered by the driver's
  * oracle gate (all six have oracleSql entries). */
class CurationSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  // ---------------------------------------------------------- PII redaction

  test("pii: crafted strings with emails/ips/phones are fully redacted") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, "mail me at jane.doe+spam@sub.example.org thanks"),
      (2L, "server 192.168.0.1 and 10.0.0.255 are down, call 415-555-0100"),
      (3L, "no pii here at all"),
      (4L, "a@b.co and c@d.io on 1.2.3.4"),
    ).toDF("doc_id", "text")
    // run the same stepwise chain the query uses, against raw text
    val out = df
      .withColumn("n_email", regexp_count(col("text"), lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")))
      .withColumn("t1", regexp_replace(col("text"), "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"))
      .withColumn("n_ip", regexp_count(col("t1"), lit("\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b")))
      .withColumn("t2", regexp_replace(col("t1"), "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "[IP]"))
      .withColumn("n_phone", regexp_count(col("t2"), lit("\\b\\d{3}-\\d{3}-\\d{4}\\b")))
      .withColumn("red", regexp_replace(col("t2"), "\\b\\d{3}-\\d{3}-\\d{4}\\b", "[PHONE]"))
      .select("doc_id", "n_email", "n_ip", "n_phone", "red")
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(out(1L) == ((1, 0, 0, "mail me at [EMAIL] thanks")))
    assert(out(2L) == ((0, 2, 1, "server [IP] and [IP] are down, call [PHONE]")))
    assert(out(3L) == ((0, 0, 0, "no pii here at all")))
    assert(out(4L) == ((2, 1, 0, "[EMAIL] and [EMAIL] on [IP]")))
  }

  test("pii: corpus query fires every synthetic pattern once per doc") {
    val rows = CurationQueries.qPiiRedact(spark, sf).collect()
    assert(rows.nonEmpty)
    // the augmentation appends exactly one email, one ip, one phone per doc
    assert(rows.forall(r => r.getInt(1) >= 1 && r.getInt(2) >= 1 && r.getInt(3) >= 1))
  }

  // -------------------------------------------------------- decontamination

  test("decontaminate: gram hashes are distinct, empty below 13 words") {
    assert(CurationQueries.gramHashes("one two three").isEmpty)
    val t = "a b c d e f g h i j k l m n" // 14 words -> 2 grams
    val g = CurationQueries.gramHashes(t)
    assert(g.length == 2 && g.distinct.length == 2)
    // repeated text -> same grams, deduped
    val rep = (t + " " + t).trim
    assert(CurationQueries.gramHashes(rep).length > 2)
  }

  test("decontaminate: corpus output covers all train docs, flags some") {
    val rows = CurationQueries.qDecontaminate(spark, sf).collect()
    assert(rows.forall(_.getLong(0) % 10 != 0)) // eval docs excluded
    assert(rows.forall(r => r.getLong(1) >= 0))
    // contaminated == n_dirty > 0
    assert(rows.forall(r => r.getBoolean(2) == (r.getLong(1) > 0)))
    // near-dup pairs crossing the eval/train split exist in the corpus
    assert(rows.exists(_.getBoolean(2)))
  }

  // ---------------------------------------------------- stratified sampling

  test("sample: per-source rates are honored within hash tolerance") {
    val rows = CurationQueries.qSampleStratified(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rate, nTotal, nSampled) = (r.getInt(2), r.getLong(3), r.getLong(4))
      assert(nSampled <= nTotal)
      // md5 mod 100 is uniform; exact equality is the oracle's job, here
      // only sanity: sampled fraction within [0, 1] and 80% tier > 10% tier
      assert(nSampled >= 0 && rate >= 10 && rate <= 80)
    }
    val bySrc = rows.map(r => r.getString(0) -> (r.getLong(4).toDouble / r.getLong(3))).toMap
    if (bySrc.contains("src0") && bySrc.contains("src19"))
      assert(bySrc("src19") > bySrc("src0"))
  }

  // ------------------------------------------------------- substring dedup

  test("substring dedup: exact duplicate docs share all windows") {
    val rows = CurationQueries.qDedupSubstring(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"dup windows > windows for ${r.getLong(0)}")
    }
    // the corpus has near/exact dup pairs -> some doc must show dup windows
    assert(rows.exists(_.getLong(2) > 0))
  }

  test("segment repetition removal: counts consistent, cleaned digest stable") {
    val rows = CurationQueries.qDedupSegments(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "removed > total segments")
      assert(r.getString(3).length == 32)
    }
    // near-dup pairs share aligned segments -> some doc loses segments
    assert(rows.exists(_.getLong(2) > 0))
    // docs with nothing removed keep their full text: digest == md5(text)
    val d = spark.read.parquet(s"$sf/documents.parquet").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val clean = rows.filter(_.getLong(2) == 0)
    assert(clean.nonEmpty)
    clean.take(20).foreach { r =>
      val expect = java.security.MessageDigest.getInstance("MD5")
        .digest(d(r.getLong(0)).getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getString(3) == expect, s"doc ${r.getLong(0)} rebuild drifted")
    }
  }

  // ----------------------------------------------------- incremental dedup

  test("incremental dedup: keeper from seen half, -1 when new") {
    val rows = CurationQueries.qDedupIncremental(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(0) >= 250))
    rows.foreach { r =>
      val (nShared, keeper, dup) = (r.getLong(1), r.getLong(2), r.getBoolean(3))
      assert(dup == (keeper >= 0))
      assert(dup == (nShared > 0))
      if (dup) assert(keeper < 250)
    }
    // the corpus has near-dup pairs crossing the seen/batch split
    assert(rows.exists(_.getBoolean(3)))
  }

  test("incremental dedup: bloom-fronted variant is result-identical to exact") {
    val exact = CurationQueries.qDedupIncremental(spark, sf).collect().map(_.toSeq)
    val bloom = CurationQueries.qDedupIncrBloom(spark, sf).collect().map(_.toSeq)
    assert(exact.toSeq == bloom.toSeq) // bloom has no false negatives; FPs die in the join
  }

  // ------------------------------------------------------ sequence packing

  test("packing: bins advance monotonically per source, spans_cut consistent") {
    val rows = CurationQueries.qPackSequences(spark, sf).collect()
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_.getString(1))
    bySrc.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(0))
      var cum = 0L
      sorted.foreach { r =>
        val (nTok, first, last) = (r.getLong(2), r.getLong(3), r.getLong(4))
        assert(first <= last)
        assert(r.getBoolean(5) == (last > first))
        // bins match the running token count exactly (concat-and-cut)
        assert(first == cum / 512)
        cum += nTok
        assert(last == (cum - 1) / 512)
      }
    }
  }

  test("mix weights: shares sum to 1, weights rebalance toward uniform under the epoch cap") {
    val rows = CurationQueries.qMixWeights(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length > 1, "corpus has multiple sources")
    val shares = rows.map(_.getDouble(3))
    assert(math.abs(shares.sum - 1.0) < 1e-4)
    val k = rows.length.toDouble
    rows.foreach { r =>
      val (share, w) = (r.getDouble(3), r.getDouble(4))
      assert(w > 0.0 && w <= 4.0)
      // uncapped weights satisfy w·share = 1/k (uniform target) exactly up
      // to the 1e-6 rounding; capped ones sit at the 4-epoch ceiling
      assert(w == 4.0 || math.abs(w * share - 1.0 / k) < 1e-4,
        s"source=${r.getString(0)} share=$share w=$w")
    }
    // the scarcest source gets the largest weight
    val byShare = rows.sortBy(_.getDouble(3))
    assert(byShare.head.getDouble(4) == rows.map(_.getDouble(4)).max)
  }

  test("domain cap: at most 15 per source, best-first, ranks dense from 1") {
    val rows = CurationQueries.qDomainCap(spark, "/root/testdata/sf0.001").collect()
    val bySrc = rows.groupBy(_.getString(1))
    assert(bySrc.nonEmpty)
    bySrc.values.foreach { rs =>
      assert(rs.length <= 15)
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to rs.length))
      // within a source, rank order follows n_chars descending
      assert(sorted.map(_.getLong(2)).toSeq == sorted.map(_.getLong(2)).sortBy(-_).toSeq)
    }
  }

  // ------------------------------------------------------- LM quality score

  test("lm score: hand-computed integer surprisal on a crafted corpus") {
    import spark.implicits._
    // doc 0 "a a b": bigrams (a,a) (a,b)
    // doc 1 "a b c": bigrams (a,b) (b,c)
    // doc 2 "a a z" (after lower): bigrams (a,a) (a,z)
    // doc 3 "b":     no bigrams; doc 4 "": no tokens
    val df = Seq(
      (0L, "a a b"), (1L, "a b c"), (2L, "A a z"), (3L, "b"), (4L, ""),
    ).toDF("doc_id", "text")
    // uni: a=5 (ilog2 2), b=3 (1), c=1 (0), z=1 (0)
    // bg:  (a,a)=2 (1), (a,b)=2 (1), (b,c)=1 (0), (a,z)=1 (0)
    // doc0 bits = (2-1)+(2-1) = 2, n=2, avg 1.0
    // doc1 bits = (2-1)+(1-0) = 2, n=2, avg 1.0
    // doc2 bits = (2-1)+(2-0) = 3, n=2, avg 1.5
    val got = CurationQueries.lmScore(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(0L) == ((2L, 2L, 1.0)))
    assert(got(1L) == ((2L, 2L, 1.0)))
    assert(got(2L) == ((2L, 3L, 1.5)))
    assert(got(3L) == ((0L, 0L, 0.0)))
    assert(got(4L) == ((0L, 0L, 0.0)))
  }

  // ------------------------------------------------------------ BPE merges

  test("bpe: hand-computed merge sequence on a crafted corpus") {
    import spark.implicits._
    // words: aa (freq 2), ab (freq 1)
    // round 1: pairs (a,a)=2 (a,b)=1 -> merge (a,a) count 2
    // round 2: pairs (a,b)=1        -> merge (a,b) count 1
    // round 3: no pairs left        -> stop (fewer rows than merge budget)
    val df = Seq((0L, "aa ab"), (1L, "aa")).toDF("doc_id", "text")
    val got = CurationQueries.bpeMerges(df, merges = 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "a", "a", 2L), (2, "a", "b", 1L)))
  }

  test("bpe: left-to-right non-overlapping merge order (canonical BPE on runs)") {
    import spark.implicits._
    // "aaaa" merges as [aa][aa], never [a][aa][a]; freq-weighted counts:
    // round 1 pairs within aaaa: (a,a) x3, x2 docs -> cnt 6
    val df = Seq((0L, "aaaa"), (1L, "aaaa")).toDF("doc_id", "text")
    val got = CurationQueries.bpeMerges(df, merges = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "a", "a", 6L), (2, "aa", "aa", 2L)))
  }

  test("bpe encode: hand-computed encoding under the learned merges") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // merges learned on this corpus: (a,a) then (a,b) — see the train test
    val df = Seq((0L, "aa ab"), (1L, "aa")).toDF("doc_id", "text")
    val got = CurationQueries.bpeEncode(df, merges = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc0: "(a)(a) (a)(b)" -> "(aa) (a)(b)" -> "(aa) (ab)"  (2 tokens)
    // doc1: "(a)(a)" -> "(aa)"                               (1 token)
    assert(got.toSeq == Seq(
      (0L, 2L, 2L, md5hex("(aa) (ab)")),
      (1L, 1L, 1L, md5hex("(aa)"))))
  }

  test("bpe encode: left-to-right non-overlapping application on runs") {
    import spark.implicits._
    // "aaaa" + merge (a,a) encodes as [aa][aa] (2 tokens), never 3
    val df = Seq((0L, "aaaa"), (1L, "aaaa")).toDF("doc_id", "text")
    val got = CurationQueries.bpeEncode(df, merges = 1).collect()
    assert(got.forall(_.getLong(2) == 2L))
  }

  test("bpe encode: corpus run is total and merges only shrink token counts") {
    val base = CurationQueries.qBpeEncode(spark, sf, merges = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val enc = CurationQueries.qBpeEncode(spark, sf).collect()
    assert(enc.length == spark.read.parquet(s"$sf/documents.parquet").count())
    enc.foreach { r =>
      val (id, nWords, nTok) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nTok <= base(id), s"doc $id grew under merges")
      assert((nTok == 0) == (nWords == 0), s"doc $id token/word zero mismatch")
    }
    assert(enc.map(_.getLong(2)).sum < base.values.sum, "merges must fire somewhere")
  }

  test("nb classify: separable crafted corpus classifies on the diagonal") {
    import spark.implicits._
    // label-disjoint vocab -> NB must recover the labels exactly; the
    // token-free doc falls back to the max-prior label (ties -> label asc)
    val df = Seq(
      (0L, "apple banana apple banana", "srcA"),
      (1L, "banana apple banana apple", "srcA"),
      (2L, "apple apple banana banana", "srcA"),
      (3L, "carrot date carrot date", "srcB"),
      (4L, "date carrot date carrot", "srcB"),
      (5L, "carrot carrot date date", "srcB"),
      (6L, "!!! ???", "srcB"), // no [a-z0-9]+ tokens -> prior fallback
    ).toDF("doc_id", "text", "source")
    val got = CurationQueries.nbClassify(df, vocabSize = 256).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // priors: srcA 3/7, srcB 4/7 -> ilog2(3*2^30/7)=28 < ilog2(4*2^30/7)=29,
    // so the fallback label is srcB and doc 6 lands on the diagonal
    assert(got == Seq(("srcA", "srcA", 3L), ("srcB", "srcB", 4L)))
  }

  test("nb serve path: collected model reproduces the join pipeline per doc") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val model = CurationQueries.nbModelCollect(d, vocabSize = 256)
    val texts = d.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val preds = CurationQueries.nbPredictions(d, vocabSize = 256).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(preds.length == texts.size)
    preds.foreach { case (id, predicted) =>
      assert(model.predict(texts(id)) == predicted, s"doc $id serve/batch drift")
    }
  }

  test("nb classify: corpus run is a total confusion matrix over known labels") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sources = docs.select("source").distinct().collect().map(_.getString(0)).toSet
    val rows = CurationQueries.qNbClassify(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._3).sum == docs.count(), "every doc classified exactly once")
    assert(rows.forall { case (s, p, n) => sources(s) && sources(p) && n > 0 })
    val key = rows.map { case (s, p, _) => (s, p) }
    assert(key.sameElements(key.sorted), "ordered by (source, predicted)")
    assert(key.distinct.length == key.length)
  }

  test("lm score: corpus run is total, non-negative, and repetitive docs score low") {
    val rows = CurationQueries.qLmScore(spark, sf).collect()
    assert(rows.length == spark.read.parquet(s"$sf/documents.parquet").count())
    assert(rows.forall(_.getLong(2) >= 0L))
    assert(rows.forall(r => r.getDouble(3) >= 0.0))
  }

  test("url normalize: exact canonical forms for both augmentation variants") {
    val rows = CurationQueries.qUrlNormalize(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getLong(3)))
      .toMap
    // doc 0: HTTPS://WWW.Site0.Example.COM:443/a//b/page0/index.html?utm…#sec0
    //  -> scheme+host lowered, :443 and www. stripped, // collapsed,
    //     index.html dropped, tracking params gone, fragment gone
    assert(rows(0L) == (("https://site0.example.com/a/b/page0/?id=0&q=x",
      "site0.example.com", 2L)))
    // doc 1: http://site1.example.com:80/a//b/page1/?utm…#sec1
    assert(rows(1L) == (("http://site1.example.com/a/b/page1/?id=1&q=x",
      "site1.example.com", 2L)))
    // every row canonicalizes: no fragments, no default ports, no www.,
    // no duplicate slashes after the scheme, no tracking params
    val all = CurationQueries.qUrlNormalize(spark, sf).collect().map(_.getString(1))
    assert(all.forall(u => !u.contains("#") && !u.contains(":443") && !u.contains(":80/")))
    assert(all.forall(u => !u.contains("www.") && !u.contains("utm_") && !u.contains("ref=tw")))
    assert(all.forall(u => !u.drop(8).contains("//")))
  }

  test("temperature sample: smallest source keeps all, rates follow sqrt(tok_min/tok_s)") {
    val rows = CurationQueries.qTemperatureSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val tokMin = rows.map(_._2).min
    rows.foreach { case (src, tokS, rateQ, nTotal, nKept) =>
      val want = math.floor(math.sqrt(tokMin.toDouble / tokS.toDouble) * 1000000d + 0.5d).toLong
      assert(rateQ == want, s"$src: rate $rateQ != scalar $want")
      assert(nKept <= nTotal)
      // the smallest source's rate is exactly 1.0 -> every doc kept
      if (tokS == tokMin) assert(rateQ == 1000000L && nKept == nTotal, s"$src must keep all")
    }
    // bigger sources never get a higher rate
    val sorted = rows.sortBy(_._2)
    assert(sorted.map(_._3).sameElements(sorted.map(_._3).sorted.reverse))
  }
  test("dsir: target-vocab docs outrank raw-vocab docs; token counts exact") {
    import spark.implicits._
    // target source src0 speaks {alpha, beta}; the raw majority speaks
    // {gamma, delta}; two probe docs from a third source — one per
    // vocabulary — must rank by vocabulary, not by source label.
    val rows = Seq(
      (0L, "alpha beta alpha beta", "src0"),
      (1L, "beta alpha beta alpha", "src0"),
      (2L, "alpha beta alpha beta", "probe"),   // target-like
      (3L, "gamma delta gamma delta", "probe"), // raw-like
      (4L, "gamma delta gamma delta", "bulk"),
      (5L, "delta gamma delta gamma", "bulk"),
    ).toDF("doc_id", "text", "source")
    val out = CurationQueries.dsir(rows, "src0", k = 6).collect()
    assert(out.length == 6)
    val byId = out.map(r =>
      r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(byId(2L)._2 == 4L)
    // hand-derived weights (B=1024, 2^30 scale): alpha/beta buckets get
    // lw = 22 - 22 = 0; gamma/delta get lw = 19 - 22 = -3 — so the
    // target-vocab probe scores 0.0 per token, the raw-vocab one -3.0
    assert(byId(2L)._4 == 0.0 && byId(3L)._4 == -3.0)
    assert(byId(2L)._4 > byId(3L)._4)
    // output is already ranked: avg weight desc, doc_id asc
    val order = out.map(r => (r.getDouble(4), r.getLong(0))).toSeq
    assert(order == order.sortBy { case (a, id) => (-a, id) })
  }
  test("curation funnel: each stage drops exactly the crafted doc it should") {
    import spark.implicits._
    val stop = "the a of and to in is that with for"
    def uniq(prefix: String, n: Int) = (1 to n).map(i => f"$prefix$i%02d").mkString(" ")
    val rows = Seq(
      // doc 0: eval stand-in (doc_id % 10 == 0) — passes stages 1-3,
      // removed by decontamination as part of the held-out set
      (0L, s"$stop ${uniq("we", 45)}"),
      // docs 1, 2: byte-identical — stage 1 keeps the min doc_id only
      (1L, s"$stop ${uniq("wa", 45)}"),
      (2L, s"$stop ${uniq("wa", 45)}"),
      // doc 3: 2 words — fails the gopher word-count rule
      (3L, "tiny text"),
      // doc 4: "echo" 20/60 tokens — fails top_word_cnt*8 <= n_tokens
      (4L, s"$stop ${Seq.fill(20)("echo").mkString(" ")} ${uniq("wb", 30)}"),
      // doc 5: contains doc 0's leading 13-gram — contaminated
      (5L, s"$stop ${uniq("we", 13)} ${uniq("wf", 32)}"),
      // doc 6: clean survivor
      (6L, s"$stop ${uniq("wg", 45)}"),
    ).toDF("doc_id", "text")
    val got = CurationQueries.curationFunnel(rows).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1, "dedup_exact", 7L, 6L, 1L),
      (2, "gopher", 6L, 5L, 1L),
      (3, "repetition", 5L, 4L, 1L),
      (4, "decontaminate", 4L, 2L, 2L),
    ), got.mkString("\n"))
  }

  test("curation funnel: corpus run is monotone and every stage attrits") {
    val got = CurationQueries.qCurationFunnel(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == 4)
    // sequential semantics: stage i's docs_in is stage i-1's docs_kept
    got.sliding(2).foreach { case Array(a, b) => assert(a._4 == b._3) }
    got.foreach { case (_, st, in, kept, dropped) =>
      assert(in - kept == dropped && kept >= 0 && kept <= in, st)
    }
    assert(got.head._3 == 500L) // documents-table row count at this sf
    assert(got.last._4 > 0L, "pipeline must not drop everything")
  }
  test("url filter: every rule fires and reasons are first-fail ordered") {
    val rows = CurationQueries.qUrlFilter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getString(3), r.getBoolean(4)))
    assert(rows.length == 500)
    val byReason = rows.groupBy(_._4).view.mapValues(_.length).toMap
    // all four outcomes occur on the synthetic URL distribution
    assert(Set("host_blocklist", "path_keyword", "non_https", "ok").subsetOf(byReason.keySet), byReason.toString)
    rows.foreach { case (id, host, https, reason, kept) =>
      assert(host == s"site${id % 50}.example.com")
      assert(https == (id % 3 == 0))
      assert(kept == (reason == "ok"))
      // first-fail ordering: a blocklisted host reports host_blocklist even
      // when the path keyword would also fire
      if (Set(7L, 13L, 21L, 34L).contains(id % 50)) assert(reason == "host_blocklist", s"doc $id")
      else if (id % 10 == 0 || id % 10 == 5) assert(reason == "path_keyword", s"doc $id")
      else if (id % 3 != 0) assert(reason == "non_https", s"doc $id")
      else assert(reason == "ok", s"doc $id")
    }
  }

  test("robots filter: RFC 9309 longest-match with allow-wins tie-break") {
    val rows = CurationQueries.qRobotsFilter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getBoolean(4)))
    assert(rows.length == 500)
    // independent Scala re-resolution of the rule table
    def rulesFor(h: Long): Seq[(String, Boolean)] = Seq(
      if (h % 2 == 0) Some("/private" -> false) else None,
      if (h % 4 == 0) Some("/private/open" -> true) else None,
      if (h % 5 == 0) Some("/private" -> true) else None,
      if (h % 10 == 7) Some("/" -> false) else None,
    ).flatten
    rows.foreach { case (id, host, path, rule, allowed) =>
      val h = id % 50
      assert(host == s"site$h.example.com")
      val matches = rulesFor(h).filter { case (p, _) => path.startsWith(p) }
      val best = matches.sortBy { case (p, a) => (-p.length, !a) }.headOption
      assert(rule == best.map(_._1).getOrElse(""), s"doc $id path $path")
      assert(allowed == best.forall(_._2), s"doc $id path $path")
    }
    // the interesting cases actually occur on this corpus:
    // equal-length allow/disallow pair -> allow wins (hosts = 0 mod 10)
    val tie = rows.filter(r => r._1 % 50 % 10 == 0 && r._3.startsWith("/private") &&
      !r._3.startsWith("/private/open"))
    assert(tie.nonEmpty && tie.forall(r => r._4 == "/private" && r._5), tie.take(3).mkString)
    // nested allow under a disallow (longest match wins)
    val nested = rows.filter(r => r._1 % 50 % 4 == 0 && r._3.startsWith("/private/open"))
    assert(nested.nonEmpty && nested.forall(r => r._4 == "/private/open" && r._5))
    // full-block host: bare '/' is disallowed
    val block = rows.filter(r => r._1 % 50 % 10 == 7 && r._3 == "/")
    assert(block.nonEmpty && block.forall(r => r._4 == "/" && !r._5))
    // no matching rule -> allowed with empty rule
    val open = rows.filter(r => r._1 % 50 % 2 == 1 && r._1 % 50 % 10 != 7 && r._3.startsWith("/public"))
    assert(open.nonEmpty && open.forall(r => r._4 == "" && r._5))
  }

  test("robots filter plan: rule table broadcasts, frontier never shuffles") {
    val plan = CurationQueries.qRobotsFilter(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rules not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"frontier side shuffled:\n$plan")
    // the only exchange is the presentation sort's range partitioning
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(l => l.contains("rangepartitioning") || l.contains("Broadcast")),
      s"unexpected exchange:\n${exchanges.mkString("\n")}")
  }

  test("cdx index: new/revisit/changed alternation per url, surt-sorted") {
    // dense url space so every url carries ~70 captures at sf0.001
    val rows = CurationQueries.qCdxIndex(spark, sf, urlSpace = 7L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3), r.getString(4)))
    assert(rows.length == 500)
    // output ordering IS the artifact: sorted by (surt, ts)
    assert(rows.map(r => (r._2, r._3)).sliding(2).forall {
      case Array(a, b) => a._1 < b._1 || (a._1 == b._1 && a._2 < b._2); case _ => true
    })
    rows.foreach { case (id, surt, _, _, status) =>
      val uk = id % 7
      assert(surt == s"com,example,site$uk)/page$uk", surt)
      val seq = id / 7
      // digest version = seq div 2: seq 0 new, odd seq revisit, even>0 changed
      val expect = if (seq == 0L) "new" else if (seq % 2 == 1) "revisit" else "changed"
      assert(status == expect, s"doc $id seq $seq")
    }
    // all three classifications occur
    assert(rows.map(_._5).toSet == Set("new", "revisit", "changed"))
    // plan: the lag window partitions by url (never a single-partition
    // window) and the scan reads ONLY doc_id
    val plan = CurationQueries.qCdxIndex(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(uk"), s"window not keyed by url:\n$plan")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && !readSchema.contains("text"),
      s"over-read: $readSchema")
    // a revisit shares its digest with the previous capture; a change doesn't
    rows.groupBy(_._1 % 7).values.foreach { caps =>
      caps.sortBy(_._3).sliding(2).foreach {
        case Array(a, b) =>
          if (b._5 == "revisit") assert(a._4 == b._4)
          else if (b._5 == "changed") assert(a._4 != b._4)
        case _ =>
      }
    }
  }

  test("token fertility: recomputes from the per-doc bpe encode") {
    val perDoc = CurationQueries.qBpeEncode(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val meta = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val want = meta.groupBy(_._2).map { case (lang, ds) =>
      val words = ds.map(_._3.toLowerCase.split("\\s+")
        .filter(_.matches("[a-z0-9]+")))
      val nWords = ds.map(d => perDoc(d._1)._1).sum
      val nTokens = ds.map(d => perDoc(d._1)._2).sum
      val nChars = words.map(_.map(_.length.toLong).sum).sum
      lang -> ((ds.length.toLong, nWords, nTokens, nChars,
        BigDecimal(nTokens.toDouble / nWords).setScale(4, BigDecimal.RoundingMode.HALF_UP),
        BigDecimal(nChars.toDouble / nTokens).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
    }
    val got = CurationQueries.qTokenFertility(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), BigDecimal(r.getDouble(5)), BigDecimal(r.getDouble(6))))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (lang, w) => assert(got(lang) == w, lang) }
    // every lang's fertility sits in a sane band (symbols per word are
    // bounded; 10 merges compress but never to < 1 token per word)
    got.values.foreach { v => assert(v._5 >= 1.0 && v._5 <= 16.0, v) }
  }

  // -------------------------------------------------- classifier calibration

  test("classifier eval: metrics recompute from the confusion matrix") {
    val conf = CurationQueries.qNbClassify(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val eval = CurationQueries.qClassifierEval(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    val labels = conf.map(_._1).toSet
    assert(eval.keySet == labels)
    labels.foreach { l =>
      val nTrue = conf.filter(_._1 == l).map(_._3).sum
      val nPred = conf.filter(_._2 == l).map(_._3).sum
      val nCorrect = conf.filter(c => c._1 == l && c._2 == l).map(_._3).sum
      val (et, ep, ec, rec, prec, f1) = eval(l)
      assert((et, ep, ec) == ((nTrue, nPred, nCorrect)), s"counts for $l")
      assert(math.abs(rec - nCorrect.toDouble / nTrue) < 5e-7, s"recall for $l")
      val expPrec = if (nPred == 0) 0.0 else nCorrect.toDouble / nPred
      assert(math.abs(prec - expPrec) < 5e-7, s"precision for $l")
      val expF1 = if (prec + rec == 0.0) 0.0 else 2.0 * prec * rec / (prec + rec)
      assert(math.abs(f1 - expF1) < 5e-7, s"f1 for $l")
    }
    // the synthetic corpus is NOT perfectly separable — a calibration
    // table of all-1.0 rows would mean the test can't catch metric bugs
    assert(eval.values.exists(_._6 < 1.0))
  }

  // ------------------------------------------------------- snapshot diff

  test("snapshot diff: statuses are exhaustive and digest-driven") {
    val rows = CurationQueries.qSnapshotDiff(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // snapshot membership is doc_id arithmetic -> the expected status of
    // every url is computable independently of the engine
    rows.foreach { case (id, st) =>
      val inA = id % 10 != 9
      val inB = id % 10 != 0
      val expected =
        if (!inA) "added"
        else if (!inB) "gone"
        else if (id % 7 == 3) "changed"
        else "same"
      assert(st == expected, s"doc $id")
    }
    // non-vacuous: all four statuses occur on the real corpus
    assert(rows.values.toSet == Set("added", "gone", "changed", "same"))
    // a url present in neither snapshot never appears
    assert(rows.keySet.forall(id => id % 10 != 9 || id % 10 != 0))
  }

  test("snapshot diff plan: text reduces to md5 before the join") {
    val plan = CurationQueries.qSnapshotDiff(spark, sf)
      .queryExecution.optimizedPlan.toString
    // the join keys on doc_id alone, and each input collapses text to a
    // digest in the projection UNDER the join (text never crosses it)
    assert(plan.contains("Join FullOuter, (doc_id"), plan)
    val joinOutput = plan.linesIterator.find(_.contains("Project")).getOrElse("")
    assert(!joinOutput.contains("text#"), s"text column crosses the join:\n$plan")
    assert("md5\\(".r.findAllIn(plan).size >= 2, plan)
  }
}
