package graft

import graft.pipeline.GraftSession
import org.apache.spark.sql.SparkSession

/** Driver benchmark: times every SparkEntry query on SPARK_GRAFT_SF_DIR at
  * local[SPARK_GRAFT_CPUS]; prints ONE JSON line. Headline extra:
  * extraction throughput (pages/sec) on the synthetic corpus at this sf.
  * Scaling evidence (N vs 4N) lives in graft.tools.ScalingBench. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)

    // JVM/codegen warmup on the small sf so per-query numbers are not
    // first-query-pays-startup noise
    SparkEntry.entry(spark).count()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // headline: pure extraction throughput at this sf (pages/sec) — a fresh
    // kernel pipeline, NOT the cached x_* results
    val nPages = graft.queries.ExtractionQueries.scaleFor(sfDir)
    def freshExtract(): Long = {
      import spark.implicits._
      val pages = spark.range(0, nPages, 1, spark.sparkContext.defaultParallelism * 8)
        .map(i => graft.gen.CorpusGen.pageFor(i))
      graft.pipeline.ExtractKernel.extract(pages, graft.model.ConversionOptions())(spark)
        .where("status = 'completed'").count()
    }
    freshExtract() // warm
    val t0 = System.nanoTime()
    freshExtract()
    val extractSec = (System.nanoTime() - t0) / 1e9
    val pagesPerSec = nPages / extractSec

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"sf":"$sfDir%s","extract_pages":$nPages%d,"extract_sec":$extractSec%.3f,"extract_pages_per_sec":$pagesPerSec%.1f,"cpus":$cpus%d}""")
    spark.stop()
  }
}
