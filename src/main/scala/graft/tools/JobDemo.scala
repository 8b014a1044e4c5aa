package graft.tools

import graft.gen.CorpusGen
import graft.pipeline.{ExtractJob, GraftSession}
import graft.table.LineageTable

/** Drive the full resumable extraction job against a synthetic pages table:
  * sbt "runMain graft.tools.JobDemo [nPages] [root]"
  * Prints the run report, lineage summary, and a sample of the results
  * table read back through the snapshot. */
object JobDemo {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500)
    val root = args.drop(1).headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-jobdemo-").toString)
    val spark = GraftSession.local(8)
    import spark.implicits._

    val pages = spark.createDataset(CorpusGen.pages(n))(implicitly)
    val cfg = ExtractJob.Config(root, runId = "demo", numBuckets = 32, bucketsPerWave = 8)
    val t0 = System.nanoTime()
    val report = ExtractJob.run(spark, pages, cfg)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"report: $report; wall=$sec%.1fs (${n / sec}%.0f pages/sec incl. commit overhead)")

    val table = new LineageTable(root, cfg.numBuckets)
    println("=== lineage ===")
    table.readLineage(spark).orderBy("_bucket").show(8, truncate = false)
    println("=== results sample ===")
    table.read(spark)
      .select("url", "document_type", "status", "page_count", "processing_time_ms")
      .show(8, truncate = false)
    println("=== status counts ===")
    table.read(spark).groupBy("document_type", "status").count().show()
    spark.stop()
  }
}
