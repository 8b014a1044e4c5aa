package graft.tools

import graft.gen.{CorpusGen, WarcGen}
import graft.model.Page
import graft.pipeline.{ExtractJob, GraftSession, Recrawl, WetExport}
import graft.sources.WarcSource
import graft.table.LineageTable
import org.apache.spark.sql.functions._

/** Drive the COMPLETE crawl loop end to end — the round-5 story in one
  * main: crawl A arrives as WARC segments → full extraction into the
  * lineage table → crawl B arrives (some urls changed, some gone, some
  * added) → digest-only diff → DELTA-ONLY re-extraction appended
  * merge-on-read → gone urls retired (tombstones, no data scan) → WET
  * publication from the committed table (no recompute). Prints per-stage
  * counts and the delta-leg throughput; exits nonzero if the final
  * visible url set is not exactly crawl B.
  *
  * Usage: sbt "runMain graft.tools.CrawlDemo [nPages] [perFile] [cores]" */
object CrawlDemo {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val perFile = args.drop(1).headOption.map(_.toInt).getOrElse(1000)
    val cores = args.drop(2).headOption.map(_.toInt).getOrElse(8)
    val base = java.nio.file.Files.createTempDirectory("graft-crawldemo-").toString
    val (dirA, dirB, root, wetDir) =
      (s"$base/crawlA", s"$base/crawlB", s"$base/table", s"$base/wet")

    // crawl A: latest capture per url
    val a = CorpusGen.pages(n).groupBy(_.url).values
      .map(_.maxBy(_.warc_ts.getTime)).toSeq
    WarcGen.writeFiles(dirA, a, perFile, gzipped = true)

    // crawl B: ~10% gone, ~10% changed (donor payload, newer ts), 2% added
    def slot(p: Page): Int = math.abs(p.url.hashCode) % 10
    val donors = CorpusGen.pages(n * 2).drop(n + n / 2)
    val changed = a.filter(slot(_) == 3).zipWithIndex.map { case (p, i) =>
      p.copy(html = donors(i).html, text = donors(i).text,
        warc_ts = new java.sql.Timestamp(p.warc_ts.getTime + 86400000L))
    }
    val added = CorpusGen.pages(n * 3).drop(n * 3 - math.max(n / 50, 1))
      .filterNot(p => a.exists(_.url == p.url))
    val b = a.filter(p => slot(p) != 3 && slot(p) != 7) ++ changed ++ added
    WarcGen.writeFiles(dirB, b, perFile, gzipped = true)
    println(s"crawl A: ${a.size} urls; crawl B: ${b.size} urls " +
      s"(${changed.size} changed, ${a.count(slot(_) == 7)} gone, ${added.size} added)")

    val spark = GraftSession.local(cores)
    try {
      def pagesOf(dir: String) =
        WarcSource.asPages(spark.read.format("warc").load(dir))

      // full extraction of crawl A — TEXT output: this table feeds WET
      // publication, and fromTable faithfully publishes the stored
      // content (it cannot re-derive text from a markdown table)
      val opts = graft.model.ConversionOptions(
        outputFormat = graft.model.OutputFormat.Text)
      val t0 = System.nanoTime()
      ExtractJob.run(spark, pagesOf(dirA),
        ExtractJob.Config(root, runId = "crawlA", numBuckets = 16, options = opts))
      val table = new LineageTable(root, 16)
      println(f"crawl A extracted: ${table.readVisible(spark).count()} rows " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s")

      // digest-only diff
      val diff = Recrawl.diff(pagesOf(dirA), pagesOf(dirB))
        .groupBy(col("status")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      println(s"diff: $diff")

      // delta-only re-extraction, appended merge-on-read
      val t1 = System.nanoTime()
      Recrawl.run(spark, pagesOf(dirA), pagesOf(dirB),
        ExtractJob.Config(root, runId = "crawlB", numBuckets = 16, options = opts))
      val deltaSec = (System.nanoTime() - t1) / 1e9
      val delta = diff.getOrElse("added", 0L) + diff.getOrElse("changed", 0L)
      println(f"recrawl: $delta pages re-extracted in $deltaSec%.1f s = " +
        f"${delta / deltaSec}%.0f pages/sec @ $cores cores (delta leg)")

      // retire urls crawl B no longer carries
      val retired = Recrawl.retireGone(table, pagesOf(dirA), pagesOf(dirB))
      println(s"retired: $retired gone urls (tombstones, no data scan)")

      // publish WET from the committed table - no recompute
      WetExport.fromTable(spark, table, wetDir)
      val wet = spark.read.format("warc").option("all_records", "true").load(wetDir)
      println(s"wet published: ${wet.count()} conversion records")

      // CDX across BOTH crawls: same-payload re-captures classify revisit,
      // changed payloads classify changed
      val cdx = graft.pipeline.CdxIndex.fromCaptures(
        spark.read.format("warc").load(dirA, dirB))
        .groupBy(col("status")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      println(s"cdx: $cdx")

      // the loop invariant: visible urls == crawl B exactly
      val visible = table.readLatest(spark, versionCol = "warc_ts")
        .select("url").collect().map(_.getString(0)).toSet
      val want = b.map(_.url).toSet
      require(visible == want,
        s"visible set diverged: ${(visible -- want).size} extra, ${(want -- visible).size} missing")
      println(s"loop invariant holds: ${visible.size} visible urls == crawl B")
    } finally spark.stop()
  }
}
