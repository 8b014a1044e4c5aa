package graft.tools

import graft.model.{ConversionOptions, Page}
import graft.pipeline.{ExtractKernel, GraftSession, Skew}

/** Two-cluster-size scaling evidence (north rule: throughput scaling
  * efficiency ≥ 0.8 from N to 4N executors; no real cluster in this
  * sandbox, so per driver instruction: the identical job at local[N] and
  * local[4N] on the same input — reported in BENCH.md).
  *
  * The measured job is the production shape: parquet scan of a pages table
  * (pre-materialized once; Common-Crawl-style inputs come from a table, so
  * synthetic-corpus generation cost is excluded from the measurement) →
  * typed extraction kernel → count of completed rows. No payload shuffle
  * (see ExtractJob's shuffle note).
  *
  * Usage: sbt "runMain graft.tools.ScalingBench [nPages] [smallCores]"
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val nPages = args.headOption.map(_.toInt).getOrElse(160000)
    val nSmall = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val nBig = nSmall * 4
    val corpusDir = s"/tmp/graft-bench-corpus-$nPages"

    // materialize the corpus once (not timed): ~128 files so both levels
    // get fine-grained splits
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(corpusDir, "_SUCCESS"))) {
      val spark = GraftSession.local(nBig)
      import spark.implicits._
      try spark.range(0, nPages, 1, 128)
        .map(i => graft.gen.CorpusGen.pageFor(i))
        .write.mode("overwrite").parquet(corpusDir)
      finally spark.stop()
    }

    def extractCount(spark: org.apache.spark.sql.SparkSession): Long = {
      import spark.implicits._
      val pages = spark.read.parquet(corpusDir).as[Page]
      ExtractKernel.extract(pages, ConversionOptions())(spark)
        .where("status = 'completed'").count()
    }

    /** One timed pass in a fresh session for `cores` (with an in-session
      * warmup run first). The sandbox suffers intermittent host CPU-steal
      * windows (identical work varies 10x for ~30s periods — /proc/stat
      * steal confirms), so reps of the two levels are INTERLEAVED and the
      * min per level taken: a steal window then cannot sink one level only,
      * and min approximates the uncontended steady state. */
    def measureOnce(cores: Int): Double = {
      val spark = GraftSession.local(cores)
      try {
        extractCount(spark) // in-session warmup (codegen/JIT), discarded
        val t0 = System.nanoTime()
        require(extractCount(spark) > 0)
        (System.nanoTime() - t0) / 1e9
      } finally spark.stop()
    }

    val reps = (0 until 4).map { r =>
      val a = measureOnce(nSmall)
      val b = measureOnce(nBig)
      println(f"rep=$r secN=$a%.2f sec4N=$b%.2f")
      (a, b)
    }
    val secN = reps.map(_._1).min
    val sec4N = reps.map(_._2).min
    val thrN = nPages / secN
    val thr4N = nPages / sec4N
    val eff = (thr4N / thrN) / 4.0
    println(f"""{"scaling":{"n_pages":$nPages,"cores_n":$nSmall,"sec_n":$secN%.2f,"pages_per_sec_n":$thrN%.1f,"cores_4n":$nBig,"sec_4n":$sec4N%.2f,"pages_per_sec_4n":$thr4N%.1f,"efficiency":$eff%.3f}}""")
  }
}
