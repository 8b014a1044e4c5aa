package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** Large-scale training-data pipeline operators over the `documents` and
  * `embeddings` tables: deduplication (exact, MinHash+LSH, SimHash, n-gram
  * Jaccard, embedding-cosine), similarity search (brute-force cosine top-k +
  * LSH-bucketed ANN), and text analysis (language id, quality scoring,
  * token counting, winnowing fingerprints).
  *
  * Scale design notes (100 TB shapes):
  *  - every dedup variant is blocking-based: candidates come from an
  *    equi-join on a compact key (hash / band / bucket), never a cross
  *    join — the shuffle is on the banding key and AQE splits hot buckets;
  *  - signatures (minhash/simhash/fingerprints) are computed in one
  *    map-side pass per document and are tiny relative to text, so the
  *    pair-verification join moves signatures, not full documents, except
  *    the final exact-jaccard check which re-reads only candidate texts;
  *  - brute-force cosine stays fully codegen'd (zip_with + aggregate — no
  *    UDF) and broadcasts the probe vector; the LSH variant prunes to a
  *    sign-bucket neighborhood first (the IVF-style scale path).
  */
object TrainingDataQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  // ------------------------------------------------------------ exact dedup

  /** Exact duplicate groups by content hash (hash-groupBy; T12 analog). */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper_doc_id"))
      .orderBy(col("text_md5"))

  // --------------------------------------------------------- minhash + LSH

  val MinhashPerms = 128
  val LshBands = 16 // 16 bands x 8 rows
  private val RowsPerBand = MinhashPerms / LshBands

  /** Word-3-shingle hashes of a document: sorted distinct primitive array
    * (no boxing — these run per row in the hot path). */
  def shingleSet(text: String, k: Int = 3): Array[Long] = {
    val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (words.length < k) {
      if (words.isEmpty) Array.empty
      else Array(MurmurHash3.arrayHash(words.asInstanceOf[Array[AnyRef]], 31).toLong)
    } else {
      val raw = new Array[Long](words.length - k + 1)
      var i = 0
      while (i + k <= words.length) {
        var h = 1125899906842597L
        var j = i
        while (j < i + k) {
          h = h * 31 + MurmurHash3.stringHash(words(j), 42)
          j += 1
        }
        raw(i) = h
        i += 1
      }
      sortedDistinct(raw)
    }
  }

  @inline def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def sortedDistinct(raw: Array[Long]): Array[Long] = {
    java.util.Arrays.sort(raw)
    var n = 0
    var i = 0
    while (i < raw.length) {
      if (n == 0 || raw(i) != raw(n - 1)) { raw(n) = raw(i); n += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(raw, n)
  }

  /** Minhash signature over a shingle hash array: min over a splitmix64
    * remix per permutation (a universal-hash family without the 61-bit
    * mod — ~5x faster per op than (a·h+b) mod p). */
  def minhashSig(hashes: Array[Long], perms: Int): Array[Long] = {
    val sig = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < hashes.length) {
      val h = hashes(i)
      var p = 0
      while (p < perms) {
        val v = splitmix64(h ^ (p.toLong * 0xc2b2ae3d27d4eb4fL))
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    sig
  }

  /** 128-perm minhash signature of the word-shingle set. */
  def minhashSignature(text: String): Array[Long] = minhashSig(shingleSet(text), MinhashPerms)

  /** Band hashes (LSH keys) from a signature. */
  def bandHashes(sig: Array[Long]): Array[Long] = bandKeys(sig, LshBands, RowsPerBand)

  def bandKeys(sig: Array[Long], bands: Int, rows: Int): Array[Long] =
    Array.tabulate(bands) { b =>
      var h = b.toLong * 1000003L
      var r = b * rows
      while (r < (b + 1) * rows) { h = h * 31 + sig(r); r += 1 }
      h
    }

  def jaccardSorted(sa: Array[Long], sb: Array[Long]): Double = {
    if (sa.isEmpty && sb.isEmpty) return 1.0
    var i = 0
    var j = 0
    var inter = 0L
    while (i < sa.length && j < sb.length) {
      if (sa(i) == sb(j)) { inter += 1; i += 1; j += 1 }
      else if (sa(i) < sb(j)) i += 1
      else j += 1
    }
    val union = sa.length.toLong + sb.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  def exactJaccard(a: String, b: String): Double =
    jaccardSorted(shingleSet(a), shingleSet(b))

  /** Near-duplicate pairs via MinHash + LSH banding, verified with exact
    * shingle Jaccard ≥ `threshold`. Output: (doc_a, doc_b, jaccard_r). */
  def qDedupMinhashLsh(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    import spark.implicits._
    val bandsUdf = udf((text: String) => bandHashes(minhashSignature(text)))
    val jaccardUdf = udf((a: String, b: String) => exactJaccard(a, b))

    val d = docs(spark, dir).select(col("doc_id"), col("text"))
    // band join moves ONLY (doc_id, band) — never text: at 100 TB the
    // posexplode duplicates every row ×16 bands, so carrying payloads here
    // would shuffle 16× the corpus; texts are re-joined for the (small)
    // candidate set afterwards
    val banded = d
      .select(col("doc_id"), posexplode(bandsUdf(col("text"))).as(Seq("band_idx", "band")))

    val left = banded.select(col("band_idx").as("bi_a"), col("band").as("b_a"), col("doc_id").as("doc_a"))
    val right = banded.select(col("band_idx").as("bi_b"), col("band").as("b_b"), col("doc_id").as("doc_b"))
    val candidates = left.join(right,
        col("bi_a") === col("bi_b") && col("b_a") === col("b_b") &&
          col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")

    candidates
      .join(d.select(col("doc_id").as("doc_a"), col("text").as("text_a")), "doc_a")
      .join(d.select(col("doc_id").as("doc_b"), col("text").as("text_b")), "doc_b")
      .withColumn("jaccard_r", round(jaccardUdf(col("text_a"), col("text_b")), 4))
      .where(col("jaccard_r") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard_r"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---------------------------------------------------------------- simhash

  /** 64-bit SimHash over word unigrams. */
  def simhash64(text: String): Long = {
    val acc = new Array[Int](64)
    text.toLowerCase.split("\\s+").withFilter(_.nonEmpty).foreach { w =>
      val h = (MurmurHash3.stringHash(w, 42).toLong << 32) | (MurmurHash3.stringHash(w, 7).toLong & 0xffffffffL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** SimHash near-dup pairs: block on 16-bit sub-bands (a pair within
    * hamming ≤ 3 shares at least one of 4 bands), verify hamming ≤ `maxHam`. */
  def qDedupSimhash(spark: SparkSession, dir: String, maxHam: Int = 3): DataFrame = {
    val simUdf = udf((text: String) => simhash64(text))
    val d = docs(spark, dir)
      .select(col("doc_id"), simUdf(col("text")).as("sim"))
      .withColumn("band", explode(array((0 until 4).map(b =>
        struct(lit(b).as("idx"), shiftright(col("sim"), b * 16).bitwiseAND(lit(0xffffL)).as("key"))): _*)))
      .select(col("doc_id"), col("sim"), col("band.idx").as("band_idx"), col("band.key").as("band_key"))

    val l = d.select(col("band_idx").as("bi_a"), col("band_key").as("bk_a"), col("doc_id").as("doc_a"), col("sim").as("sim_a"))
    val r = d.select(col("band_idx").as("bi_b"), col("band_key").as("bk_b"), col("doc_id").as("doc_b"), col("sim").as("sim_b"))
    l.join(r, col("bi_a") === col("bi_b") && col("bk_a") === col("bk_b") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .where(col("hamming") <= maxHam)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // --------------------------------------------------------- ngram jaccard

  /** Character-n-gram Jaccard near-dups. Blocking = minhash banding over
    * char-5-gram shingles (24 bands x 3 rows — ~80% recall at J=0.4, ~99%
    * at J=0.6); candidates verified with exact char-5-gram Jaccard.
    * (A naive length-bucket + global-min-shingle block degenerates to
    * near-O(n²) on low-vocabulary corpora — measured 274 s at sf0.1 vs
    * seconds for banding.) */
  def qDedupNgramJaccard(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    // r=6/b=20 tuned to the corpus: background similarity J≈0.18 yields
    // 0.18^6·20 ≈ 0.07% candidate rate; true near-dups (J≈0.99) recall ≈ 1
    val bands = 20
    val rows = 6
    val bandsUdf = udf((text: String) =>
      bandKeys(minhashSig(charShingles(text, 5), bands * rows), bands, rows))
    val jacUdf = udf((a: String, b: String) =>
      jaccardSorted(charShingles(a, 5), charShingles(b, 5)))
    val base = docs(spark, dir).select(col("doc_id"), col("text"))
    // signatures-only band join (see qDedupMinhashLsh note); texts rejoined
    // for candidates only
    val d = base
      .select(col("doc_id"), posexplode(bandsUdf(col("text"))).as(Seq("band_idx", "band")))
    val l = d.select(col("band_idx").as("bi_a"), col("band").as("b_a"), col("doc_id").as("doc_a"))
    val r = d.select(col("band_idx").as("bi_b"), col("band").as("b_b"), col("doc_id").as("doc_b"))
    l.join(r, col("bi_a") === col("bi_b") && col("b_a") === col("b_b") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .join(base.select(col("doc_id").as("doc_a"), col("text").as("text_a")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("text").as("text_b")), "doc_b")
      .withColumn("jaccard5_r", round(jacUdf(col("text_a"), col("text_b")), 4))
      .where(col("jaccard5_r") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard5_r"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Char-k-gram hashes: sorted distinct primitive array; rolling
    * polynomial hash remixed with splitmix64 (no substring allocation). */
  def charShingles(text: String, k: Int): Array[Long] = {
    val t = text.toLowerCase
    if (t.length < k) {
      return if (t.isEmpty) Array.empty else Array(splitmix64(MurmurHash3.stringHash(t, 42).toLong))
    }
    val n = t.length - k + 1
    val raw = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 1469598103934665603L
      var j = i
      while (j < i + k) { h = (h ^ t.charAt(j)) * 1099511628211L; j += 1 }
      raw(i) = splitmix64(h)
      i += 1
    }
    sortedDistinct(raw)
  }

  // ------------------------------------------------- embedding similarity

  /** Tight-loop cosine for pair joins (candidate volume × array-churn makes
    * the SQL expression variant the bottleneck there). */
  def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na) / math.sqrt(nb)
  }
  private val cosineUdf = udf((a: Seq[Float], b: Seq[Float]) => cosine(a, b))

  /** Codegen'd cosine similarity between two array<float> columns — no UDF:
    * zip_with for the products, aggregate for the sums. Used on the
    * broadcast brute-force path (single columnar pass). */
  def cosineCol(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))
  }

  /** Brute-force cosine top-k against probe vec_id=0 (the exact baseline). */
  def qAnnBruteForce(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val e = emb(spark, dir)
    val probe = e.where(col("vec_id") === 0).select(col("embedding").as("probe"))
    e.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), round(cosineCol(col("embedding"), col("probe")), 4).as("cos_r"))
      .orderBy(col("cos_r").desc, col("vec_id"))
      .limit(k)
      .orderBy(col("vec_id"))
  }

  /** Embedding-cosine near-duplicate candidates via banded sign-LSH:
    * 4 bands x 6 random-hyperplane bits; candidate pairs share at least one
    * band key (equi-join on the band — never O(n²)); verified with exact
    * cosine and ranked. At 100 TB the band join shuffles only (id, 64-float
    * vector) pairs inside matching buckets; band count/width trade recall
    * vs candidate volume exactly like minhash LSH. */
  def qDedupEmbCosine(spark: SparkSession, dir: String, threshold: Double = 0.35, topN: Int = 50): DataFrame = {
    val bands = 6
    val bitsPerBand = 8
    val base = emb(spark, dir).select(col("vec_id"), col("embedding"))
    // band join moves ONLY (vec_id, band_key) — the 384-float vectors are
    // rejoined for candidate pairs, not duplicated ×6 bands through the
    // shuffle
    val e = base
      .select(col("vec_id"), explode(array((0 until bands).map(m =>
        struct(lit(m).as("band_idx"),
          signSketchCol(col("embedding"), bitsPerBand, m * bitsPerBand).as("band_key"))): _*)).as("band"))
      .select(col("vec_id"), col("band.band_idx").as("band_idx"), col("band.band_key").as("band_key"))
    // rename join keys on BOTH sides: same-lineage column refs would
    // resolve to one attribute and make the equality trivially true
    val l = e.select(col("band_idx").as("bi_a"), col("band_key").as("bk_a"), col("vec_id").as("vec_a"))
    val r = e.select(col("band_idx").as("bi_b"), col("band_key").as("bk_b"), col("vec_id").as("vec_b"))
    l.join(r, col("bi_a") === col("bi_b") && col("bk_a") === col("bk_b") && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
      .join(base.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")), "vec_a")
      .join(base.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")), "vec_b")
      .select(col("vec_a"), col("vec_b"), round(cosineUdf(col("emb_a"), col("emb_b")), 4).as("cos_r"))
      .where(col("cos_r") >= threshold)
      .orderBy(col("cos_r").desc, col("vec_a"), col("vec_b"))
      .limit(topN)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** LSH-bucketed ANN: probe restricted to its 4-bit sign-sketch bucket
    * (exact cosine within the bucket). Returns bucket-local top-k. */
  def qAnnLsh(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = emb(spark, dir).withColumn("sketch", signSketchCol(col("embedding"), 4, 0))
    val probe = e.where(col("vec_id") === 0)
      .select(col("sketch").as("probe_sketch"), col("embedding").as("probe"))
    e.where(col("vec_id") =!= 0)
      .join(broadcast(probe), col("sketch") === col("probe_sketch"))
      .select(col("vec_id"), round(cosineCol(col("embedding"), col("probe")), 4).as("cos_r"))
      .orderBy(col("cos_r").desc, col("vec_id"))
      .limit(k)
      .orderBy(col("vec_id"))
  }

  /** IVF-style ANN: a coarse quantizer (k-means, deterministic hash-seeded
    * init, fixed Lloyd iterations) trained on a driver-side SAMPLE of the
    * vectors — the standard IVF recipe at scale: train on ~10^5 sampled
    * vectors centrally, broadcast the centroids, assign the full corpus
    * distributed, then search only the probe's nProbe nearest lists.
    * Here the sample is the whole (tiny) table; at 100 TB it would be
    * `.sample(...)` with the same code path. */
  def qAnnIvf(spark: SparkSession, dir: String, k: Int = 10, nList: Int = 16, nProbe: Int = 2): DataFrame = {
    val e = emb(spark, dir).select(col("vec_id"), col("embedding"))
    // train: deterministic sample → driver k-means
    val sample = e.orderBy(col("vec_id")).limit(4096)
      .collect().map(r => r.getSeq[Float](1).toArray)
    val centroids = KMeans.fit(sample, nList, iters = 8)
    val bc = spark.sparkContext.broadcast(centroids)

    val assignUdf = udf((v: Seq[Float]) => KMeans.nearest(bc.value, v))
    val assigned = e.withColumn("list_id", assignUdf(col("embedding")))

    val probeRow = e.where(col("vec_id") === 0).select(col("embedding")).head()
    val probeVec = probeRow.getSeq[Float](0).toArray
    val probeLists = KMeans.nearestN(centroids, scala.collection.immutable.ArraySeq.unsafeWrapArray(probeVec), nProbe)

    assigned
      .where(col("vec_id") =!= 0 && col("list_id").isin(probeLists: _*))
      .select(col("vec_id"),
        round(cosineUdf(col("embedding"), typedLit(probeVec.toSeq)), 4).as("cos_r"))
      .orderBy(col("cos_r").desc, col("vec_id"))
      .limit(k)
      .orderBy(col("vec_id"))
  }

  /** Deterministic random-hyperplane sign sketch: bit b =
    * sign(sum_d w(b,d) * emb[d]) with rademacher weights w = ±1 from a hash.
    * `bitOffset` selects independent hyperplane sets for banding.
    * Implemented as a compact UDF: the pure-SQL expression variant
    * (zip_with + sequence + aggregate per bit) builds a non-codegen-friendly
    * expression tree that measured ~25 s on 500 rows; this UDF is
    * microseconds per row — the one place where a scalar function beats
    * composing built-ins. */
  def signSketch(emb: Seq[Float], bits: Int, bitOffset: Int): Long = {
    var out = 0L
    var b = 0
    while (b < bits) {
      var dot = 0.0
      var d = 0
      val n = emb.length
      while (d < n) {
        val w = if ((splitmix64((b + bitOffset).toLong * 0x9e3779b97f4a7c15L + d) & 1L) == 0L) 1.0 else -1.0
        dot += w * emb(d)
        d += 1
      }
      if (dot >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def signSketchCol(embCol: Column, bits: Int, bitOffset: Int): Column = {
    val f = udf((emb: Seq[Float]) => signSketch(emb, bits, bitOffset))
    f(embCol)
  }

  // ------------------------------------------------------------ text stats

  /** Quality scoring: size, token, punctuation, uppercase stats + composite
    * score — pure SQL functions, DuckDB-oracled. */
  def qQualityScore(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).as("n_char"),
        size(split(trim(col("text")), " +")).as("n_tok"),
        length(regexp_replace(col("text"), "[^.!?,;]", "")).as("n_punct"),
        length(regexp_replace(col("text"), "[^A-Z]", "")).as("n_upper"),
      )
      .withColumn("score_r",
        round(least(lit(1.0),
          col("n_tok") / 100.0 * 0.5 +
            when(col("n_punct") > 0, 0.25).otherwise(0.0) +
            when(col("n_char") > 200, 0.25).otherwise(0.0)), 4))
      .orderBy(col("doc_id"))

  /** Token counting: whitespace tokens + BPE-ish regex tokens (word pieces
    * and single punctuation marks). */
  def qTokenCount(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("bpe_tokens"),
      )
      .orderBy(col("doc_id"))

  /** Language ID: n-gram/stopword heuristic profile scoring (deterministic
    * Scala; no SQL oracle — rows-only check). Output includes agreement
    * with the table's lang label. */
  def qLangId(spark: SparkSession, dir: String): DataFrame = {
    val langUdf = udf((text: String) => LangId.detect(text))
    docs(spark, dir)
      .select(col("doc_id"), col("lang"), langUdf(col("text")).as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))
  }

  /** Winnowing fingerprints (rolling hash, window minimum): per-doc
    * fingerprint count + compact digest — rows-only. */
  def qFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val fpUdf = udf((text: String) => {
      val fps = Fingerprint.winnow(text, k = 8, w = 4)
      Array(fps.length.toLong, if (fps.isEmpty) 0L else fps.min, if (fps.isEmpty) 0L else fps.foldLeft(0L)(_ ^ _))
    })
    docs(spark, dir)
      .select(col("doc_id"), fpUdf(col("text")).as("fp"))
      .select(col("doc_id"), col("fp")(0).as("n_fp"), col("fp")(1).as("min_fp"), col("fp")(2).as("xor_fp"))
      .orderBy(col("doc_id"))
  }

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(text) AS text_md5, count(*) AS n_docs, min(doc_id) AS keeper_doc_id
        |FROM documents GROUP BY 1 ORDER BY text_md5""".stripMargin,
    "q_quality_score" ->
      """SELECT doc_id, length(text) AS n_char,
        |       len(string_split_regex(trim(text), ' +')) AS n_tok,
        |       length(regexp_replace(text, '[^.!?,;]', '', 'g')) AS n_punct,
        |       length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper,
        |       round(least(1.0,
        |         len(string_split_regex(trim(text), ' +')) / 100.0 * 0.5 +
        |         CASE WHEN length(regexp_replace(text, '[^.!?,;]', '', 'g')) > 0 THEN 0.25 ELSE 0.0 END +
        |         CASE WHEN length(text) > 200 THEN 0.25 ELSE 0.0 END), 4) AS score_r
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        |       len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
        |       len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
  )

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> (qDedupExact _),
    "q_dedup_minhash_lsh" -> ((s: SparkSession, d: String) => qDedupMinhashLsh(s, d)),
    "q_dedup_simhash" -> ((s: SparkSession, d: String) => qDedupSimhash(s, d)),
    "q_dedup_ngram_jaccard" -> ((s: SparkSession, d: String) => qDedupNgramJaccard(s, d)),
    "q_dedup_emb_cosine" -> ((s: SparkSession, d: String) => qDedupEmbCosine(s, d)),
    "q_ann_brute_force" -> ((s: SparkSession, d: String) => qAnnBruteForce(s, d)),
    "q_ann_lsh" -> ((s: SparkSession, d: String) => qAnnLsh(s, d)),
    "q_ann_ivf" -> ((s: SparkSession, d: String) => qAnnIvf(s, d)),
    "q_quality_score" -> (qQualityScore _),
    "q_token_count" -> (qTokenCount _),
    "q_lang_id" -> (qLangId _),
    "q_fingerprint" -> (qFingerprint _),
  )
}

/** Character/stopword-profile language identifier (n-gram heuristic —
  * offline substitute for model-based langid). */
object LangId {
  private val Profiles: Map[String, (Set[String], String)] = Map(
    "en" -> (Set("the", "and", "of", "to", "a", "in", "is", "that", "for", "with"), ""),
    "de" -> (Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"), "äöüß"),
    "fr" -> (Set("le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour"), "éèêàçùâî"),
    "es" -> (Set("el", "los", "las", "es", "una", "para", "con", "por", "del", "se"), "ñáéíóú¿¡"),
  )

  def detect(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val words = text.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty).take(500)
    if (words.isEmpty) return "und"
    val wordSet = words.toSeq
    var best = "und"
    var bestScore = 0.0
    Profiles.foreach { case (lang, (stops, chars)) =>
      val stopHits = wordSet.count(stops.contains).toDouble / words.length
      val charHits = if (chars.isEmpty) 0.0
        else text.count(c => chars.indexOf(c) >= 0).toDouble / math.max(text.length, 1) * 10
      val score = stopHits + charHits
      if (score > bestScore) { bestScore = score; best = lang }
    }
    if (bestScore < 0.01) "und" else best
  }
}

/** Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 style):
  * k-gram rolling hashes, per-window minimum selection. */
object Fingerprint {
  def winnow(text: String, k: Int, w: Int): Array[Long] = {
    if (text == null || text.length < k) return Array.empty
    val t = text.toLowerCase
    val n = t.length - k + 1
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      hashes(i) = MurmurHash3.stringHash(t.substring(i, i + k), 42).toLong & 0xffffffffL
      i += 1
    }
    if (n <= w) return Array(hashes.min)
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var start = 0
    while (start + w <= n) {
      var minIdx = start
      var j = start + 1
      while (j < start + w) {
        if (hashes(j) <= hashes(minIdx)) minIdx = j
        j += 1
      }
      out += hashes(minIdx)
      start += 1
    }
    out.toArray
  }
}

/** Deterministic k-means for the IVF coarse quantizer: hash-seeded farthest
  * -point-ish init (spread via stride over a hash-sorted sample), fixed
  * Lloyd iteration count, empty clusters re-seeded deterministically. */
object KMeans {

  def fit(sample: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] = {
    require(sample.nonEmpty)
    val dim = sample(0).length
    // init: order sample by a content hash, take k at even strides
    val ordered = sample.sortBy(v => java.util.Arrays.hashCode(v))
    val kk = math.min(k, ordered.length)
    var centroids = Array.tabulate(kk)(c => ordered(c * ordered.length / kk).clone())

    for (_ <- 0 until iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      sample.foreach { v =>
        val c = nearest(centroids, scala.collection.immutable.ArraySeq.unsafeWrapArray(v))
        counts(c) += 1
        var d = 0
        while (d < dim) { sums(c)(d) += v(d); d += 1 }
      }
      centroids = Array.tabulate(kk) { c =>
        if (counts(c) == 0) ordered((c * 2654435761L % ordered.length).toInt.abs).clone()
        else {
          val out = new Array[Float](dim)
          var d = 0
          while (d < dim) { out(d) = (sums(c)(d) / counts(c)).toFloat; d += 1 }
          out
        }
      }
    }
    centroids
  }

  def nearest(centroids: Array[Array[Float]], v: Seq[Float]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val d = sqDist(centroids(c), v)
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  def nearestN(centroids: Array[Array[Float]], v: Seq[Float], n: Int): Seq[Int] =
    centroids.indices.sortBy(c => sqDist(centroids(c), v)).take(n)

  private def sqDist(a: Array[Float], b: Seq[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }
}
