package graft.queries

import graft.core.DuckHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph analytics over the corpus — the web-scale operators a
  * Common-Crawl pipeline runs on the hyperlink structure next to the text:
  * edge-list construction and PageRank (Page et al. 1999, "The PageRank
  * Citation Ranking") as iterative keyed DataFrame joins, the same
  * scale discipline as [[TrainingDataQueries.connectedComponents]] (16-byte
  * rank rows shuffle, payloads never do; one eager checkpoint per round
  * keeps the plan flat; reliable checkpoint on a cluster).
  *
  * The `documents` table carries no hyperlinks, so the graph is a
  * DETERMINISTIC md5-derived stand-in (same augmentation discipline as
  * [[CurationQueries.qPiiRedact]]'s synthetic contact lines): each doc u
  * gets 1 + md5_number_lower(u || '_deg') % 3 out-edges targeting
  * md5_number_lower(u || '_t' || i) % n, self-loops dropped, duplicate
  * targets collapsed. Both engines rebuild the identical edge set from the
  * table alone, so PageRank is a FULL-PIPELINE hard check (graph
  * derivation + iteration + convergence state all hash-compared). Real
  * href extraction from the HTML corpus is hard-checked separately
  * (x_links64 over the pinned 64-url set).
  *
  * Cross-engine integer fixed point: ranks live in units of 1e-12
  * (Scale = 10^12 as BIGINT), damping 0.85 is the exact rational 85/100,
  * and every step is integer multiply + truncating divide — positive
  * operands, so Spark's `div` and DuckDB's `//` agree bit-for-bit and the
  * oracle needs no float tolerance. Precision: one truncation loses
  * < 1e-12 of mass per node per step — invisible at round(,4) scale and
  * irrelevant for ranking.
  *
  * 100 TB shape: edges/(node,rank) rows are 16 bytes; each iteration is
  * one keyed shuffle (groupBy dst) sized by the EDGE count, not the
  * corpus bytes; contributions pre-aggregate map-side (sum is
  * associative). Dangling mass (outdeg 0 after self-loop removal —
  * possible only when every sampled target is u itself) is dropped, not
  * redistributed: a deterministic, engine-identical choice documented
  * here rather than the textbook uniform re-spread, which would add a
  * driver-scalar broadcast per round for no test value.
  */
object GraphQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Rank scale: 1.0 of PageRank mass = 10^12 integer units. */
  val Scale = 1000000000000L
  val Iters = 8

  /** The md5-derived edge list (src, dst), distinct, self-loops removed.
    * `n` (corpus size) is a driver scalar from a metadata-cheap count —
    * the same pattern as the IVF medoid modulus. */
  private def edgeList(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id").as("src"))
    val n = d.count()
    val degUdf = udf((u: Long) =>
      1L + java.lang.Long.remainderUnsigned(DuckHash.md5NumberLower(u.toString + "_deg"), 3L))
    val tgtUdf = udf((u: Long, i: Long) =>
      java.lang.Long.remainderUnsigned(DuckHash.md5NumberLower(u.toString + "_t" + i), n))
    d.withColumn("i", explode(sequence(lit(1L), degUdf(col("src")))))
      .select(col("src"), tgtUdf(col("src"), col("i")).as("dst"))
      .where(col("dst") =!= col("src"))
      .distinct()
  }

  /** The derived link graph itself, exposed so the oracle hard-checks the
    * graph construction independently of the PageRank iteration. */
  def qLinkGraph(spark: SparkSession, dir: String): DataFrame =
    edgeList(spark, dir).orderBy(col("src"), col("dst"))

  /** Integer fixed-point PageRank, `iters` synchronous rounds:
    * r0 = Scale/n; r_{k+1}(v) = Scale·0.15/n + 0.85·Σ_{(u,v)∈E} r_k(u)/outdeg(u)
    * with every divide truncating integer division. Output: per-node final
    * rank in 1e-12 units plus outdeg. */
  def qPageRank(spark: SparkSession, dir: String, iters: Int = Iters): DataFrame =
    pageRank(docs(spark, dir).select(col("doc_id").as("node")),
      edgeList(spark, dir), iters)
      .withColumnRenamed("node", "doc_id")
      .orderBy(col("doc_id"))

  /** The iteration core over an arbitrary `(node)` / `(src, dst)` pair —
    * unit-testable against hand-computed fixed points (GraphSpec). */
  def pageRank(nodes: DataFrame, edgesIn: DataFrame, iters: Int): DataFrame = {
    val n = nodes.count()
    // edges + outdeg are reused every round: checkpoint once (reliable on a
    // cluster, local in tests) so no round re-derives them.
    val e = TrainingDataQueries.eagerCheckpoint(
      edgesIn.join(edgesIn.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src"))
    val tele = Scale * 15L / 100L / n
    // one synchronous iteration as a plan fragment
    def step(cur: DataFrame): DataFrame = {
      val sums = e
        .join(cur.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("pr div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      nodes
        .join(sums.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"), expr(s"$tele + (85 * coalesce(s, 0)) div 100").as("pr"))
    }
    var r = nodes.withColumn("pr", lit(Scale / n))
    var k = 0
    // TWO iterations per checkpoint round halves the checkpoint jobs and
    // per-round codegen events (the connectedComponents lever, SURVEY
    // §10.4). Measured at sf0.1/local[32]: warm ~3.0 s either way — the
    // remaining floor is per-SHUFFLE-STAGE scheduling overhead (fusion
    // doesn't change the stage count, only the checkpoint count), which
    // amortizes away at real scale where stages are data-bound.
    while (k + 2 <= iters) {
      r = TrainingDataQueries.eagerCheckpoint(step(step(r)))
      k += 2
    }
    if (k < iters) r = TrainingDataQueries.eagerCheckpoint(step(r))
    r.join(e.select(col("src").as("node"), col("outdeg")).distinct(), Seq("node"), "left")
      .select(col("node"), coalesce(col("outdeg"), lit(0L)).as("outdeg"), col("pr"))
  }

  // ----------------------------------------------------------- oracle SQL

  /** Shared edge-derivation CTEs (nodes / nn / raw / edges / deg). */
  private val EdgesCte: String =
    """nodes AS (SELECT doc_id AS u FROM documents),
      |nn AS (SELECT count(*) AS n FROM nodes),
      |raw AS (
      |  SELECT u, unnest(generate_series(1, (1 + md5_number_lower(u::VARCHAR || '_deg') % 3)::BIGINT)) AS i
      |  FROM nodes
      |),
      |edges AS (
      |  SELECT DISTINCT u AS src,
      |         (md5_number_lower(u::VARCHAR || '_t' || i::VARCHAR) % (SELECT n FROM nn))::BIGINT AS dst
      |  FROM raw
      |  WHERE (md5_number_lower(u::VARCHAR || '_t' || i::VARCHAR) % (SELECT n FROM nn))::BIGINT <> u
      |),
      |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1)""".stripMargin

  /** The PageRank iteration unrolled to `iters` chained CTEs — no
    * recursive aggregation needed, every step plain integer SQL. */
  private def pagerankOracle(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT nodes.u AS node,
         |         ((150000000000 // n) + (85 * coalesce(c.s, 0)) // 100)::BIGINT AS pr
         |  FROM nodes CROSS JOIN nn LEFT JOIN (
         |    SELECT e.dst, sum(r.pr // d.outdeg) AS s
         |    FROM edges e JOIN deg d ON d.src = e.src JOIN r${k - 1} r ON r.node = e.src
         |    GROUP BY e.dst) c ON c.dst = nodes.u
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $EdgesCte,
       |r0 AS (SELECT u AS node, (1000000000000 // n)::BIGINT AS pr FROM nodes CROSS JOIN nn),
       |$steps
       |SELECT r.node AS doc_id, coalesce(d.outdeg, 0) AS outdeg, r.pr
       |FROM r$iters r LEFT JOIN deg d ON d.src = r.node
       |ORDER BY doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_link_graph" -> s"WITH $EdgesCte\nSELECT src, dst FROM edges ORDER BY src, dst",
    "q_pagerank" -> pagerankOracle(Iters),
  )

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_link_graph" -> (qLinkGraph _),
    "q_pagerank" -> ((s: SparkSession, d: String) => qPageRank(s, d)),
  )
}
