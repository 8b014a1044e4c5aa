package graft.tools

import graft.gen.{CorpusGen, WarcGen}
import graft.model.{ConversionOptions, Page}
import graft.pipeline.{ExtractKernel, GraftSession}
import org.apache.spark.sql.functions._

/** Drive the crawl-container path end to end: synthesize pages → write
  * gzipped WARC shards → `spark.read.format("warc")` → extraction kernel →
  * per-type summary. The WARC write is NOT timed (crawls arrive as
  * files); the timed leg is read+extract — the shape a 100 TB job runs,
  * where each ~1 GB segment file is one input partition.
  *
  * Usage: sbt "runMain graft.tools.WarcDemo [nPages] [perFile] [cores]" */
object WarcDemo {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val perFile = args.drop(1).headOption.map(_.toInt).getOrElse(2500)
    val cores = args.drop(2).headOption.map(_.toInt).getOrElse(8)
    val dir = java.nio.file.Files.createTempDirectory("graft-warcdemo-").toString

    val pages = CorpusGen.pages(n)
    val files = WarcGen.writeFiles(dir, pages, perFile, gzipped = true)
    val bytes = files.map(f => new java.io.File(f).length()).sum
    println(f"wrote ${files.length} warc.gz shards, ${bytes / 1e6}%.1f MB for $n pages")

    val spark = GraftSession.local(cores)
    import spark.implicits._
    try {
      val t0 = System.nanoTime()
      val ds = graft.sources.WarcSource.asPages(
        spark.read.format("warc").load(dir))
      val out = ExtractKernel.extract(ds, ConversionOptions())(spark)
        .groupBy(col("document_type"), col("status"))
        .agg(count(lit(1)).as("n"), sum(length(col("content"))).as("chars"))
        .collect()
      val sec = (System.nanoTime() - t0) / 1e9
      out.sortBy(r => (r.getString(0), r.getString(1))).foreach(r =>
        println(f"${r.getString(0)}%-10s ${r.getString(1)}%-10s n=${r.getLong(2)}%-7d chars=${r.getLong(3)}"))
      println(f"warc read+extract: $n pages in $sec%.1f s = ${n / sec}%.0f pages/sec @ $cores cores")
    } finally spark.stop()
  }
}
