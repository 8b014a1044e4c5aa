package graft.tools

import graft.queries.CurationQueries
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.Random

/** Cross-engine character-semantics differential for the window-position
  * queries (VERDICT r2 next-round #8).
  *
  * The substring/segment/incremental dedup oracles index text by CHARACTER
  * position; CurationQueries documented an ASCII-corpus assumption. Both
  * engines' `substring`/`length` are in fact CODEPOINT-based (Spark
  * `UTF8String.substringSQL` walks UTF-8 chars; DuckDB `substr`/`length`
  * count codepoints, graphemes only via `substring_grapheme`), and both
  * engines' `md5(string→binary)` hash UTF-8 bytes — so the plans should
  * agree on ANY unicode input, including non-BMP (where JVM
  * `String.length` would disagree, but no query uses a JVM-side UDF for
  * positions). This tool proves it empirically:
  *
  *  - generates a deterministic 400-doc corpus in five script tiers:
  *    ASCII, precomposed+combining Latin accents, Cyrillic/Greek, CJK, and
  *    non-BMP (emoji + math alphanumerics, i.e. UTF-16 surrogate pairs),
  *    with engineered cross-doc shared prefixes (aligned duplicate
  *    windows/segments across the seen/batch split), intra-doc repeats,
  *    short-text and empty-text edge docs;
  *  - runs the four window queries over it and dumps results + oracle SQL
  *    exactly like graft.Verify;
  *  - scripts/charsem_check.py replays the oracles in DuckDB and compares
  *    hashes (4/4 must hold).
  *
  * sbt "runMain graft.tools.CharSemCheck /tmp/charsem"
  * python3 scripts/charsem_check.py /tmp/charsem
  */
object CharSemCheck {

  private val Queries = Seq("q_dedup_substring", "q_dedup_segments",
    "q_dedup_incremental", "q_dedup_incr_bloom")

  // five script tiers; tier 1 includes a COMBINING accent ("é") so a
  // grapheme-based engine would disagree with a codepoint-based one; tier 4
  // words are surrogate pairs in JVM UTF-16 (String.length ≠ codepoints)
  private val Pools: Vector[Vector[String]] = Vector(
    Vector("key", "agg", "row", "scan", "slow", "fast", "table", "value", "part", "hash", "batch", "join"),
    Vector("café", "über", "niño", "façade", "élève", "größe", "crème", "noël", "señor", "étude"),
    Vector("данные", "система", "поток", "δεδομένα", "σύστημα", "быстро", "таблица", "ροή"),
    Vector("数据", "系统", "快速", "テーブル", "データ", "테이블", "속도", "处理"),
    // non-BMP: emoji and mathematical alphanumerics (each char below the
    // comment is a surrogate pair in source/UTF-16)
    Vector("😀data", "🚀fast", "𝕊𝕡𝕒𝕣𝕜", "🧮count", "📄doc", "🌍web", "😺cat", "𝒜𝑏𝑐"),
  )

  private def wordsFrom(pool: Vector[String], rnd: Random, n: Int): String =
    (0 until n).map(_ => pool(rnd.nextInt(pool.size))).mkString(" ")

  /** Shared prefixes (tier × 4): docs carrying the same (tier, idx) prefix
    * share aligned ≥150-char runs from position 1 → guaranteed duplicate
    * windows (stride 16) and segments (stride 64) across docs, including
    * across the doc_id=250 seen/batch boundary. */
  private def prefix(tier: Int, idx: Int): String =
    wordsFrom(Pools(tier), new Random(tier * 1000L + idx), 40)

  def textFor(id: Long): String = {
    if (id == 123L) return "" // empty-text edge: null-agg coalesce branch
    val tier = (id % 5).toInt
    val rnd = new Random(id * 0x9e3779b97f4a7c15L)
    val own =
      if (id % 13 == 1) wordsFrom(Pools(tier), rnd, 4 + rnd.nextInt(4)) // short: < 64 chars, no windows
      else wordsFrom(Pools(tier), rnd, 30 + rnd.nextInt(90))
    val base =
      if (id % 3 == 0) prefix(tier, ((id / 16) % 4).toInt) + " " + own
      else own
    // intra-doc repetition (ASCII tier only, where chars == codepoints):
    // pad to a multiple of 16 then re-append the first 64 chars, so the
    // repeat lands stride-aligned and duplicates windows WITHIN one doc
    if (tier == 0 && id % 7 == 0 && base.length >= 64) {
      val pad = (16 - base.length % 16) % 16
      base + ("x" * pad) + base.substring(0, 64)
    } else base
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/charsem")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("charsem")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = (0L until 400L).map { id =>
      val t = textFor(id)
      (id, t, Seq("en", "mix", "ru", "cjk", "emoji")((id % 5).toInt),
        s"src${id % 4}", t.codePointCount(0, t.length).toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    new java.io.File(outDir).mkdirs()
    docs.coalesce(1).write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    Queries.foreach { name =>
      graft.SparkEntry.queries(name)(spark, outDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = Queries.map(n => s"${q(n)}: ${q(graft.SparkEntry.oracleSql(n))}")
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // quick signal sanity so an accidentally-dup-free corpus can't pass
    val sub = spark.read.parquet(s"$outDir/q_dedup_substring")
    val dup = sub.where($"n_dup_windows" > 0).count()
    println(s"[charsem] docs=400 docs_with_dup_windows=$dup (must be > 50)")
    require(dup > 50, "corpus lost its engineered duplicate structure")
    spark.stop()
  }
}
