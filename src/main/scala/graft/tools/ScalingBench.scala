package graft.tools

import graft.model.ConversionOptions
import graft.pipeline.{ExtractKernel, GraftSession, Skew}
import graft.queries.ExtractionQueries

/** Two-cluster-size scaling evidence (north rule: throughput scaling
  * efficiency ≥ 0.8 from N to 4N executors; no real cluster in this sandbox,
  * so per driver instruction: the identical job at local[N] and local[4N]
  * on the same input — reported in BENCH.md / BASELINE.md).
  *
  * Usage: sbt "runMain graft.tools.ScalingBench [nPages] [smallCores]"
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val nPages = args.headOption.map(_.toInt).getOrElse(20000)
    val nSmall = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val nBig = nSmall * 4

    // default = the production plan (no payload shuffle); set
    // GRAFT_BENCH_SHUFFLE=1 to measure the salted-repartition variant
    val shuffle = sys.env.get("GRAFT_BENCH_SHUFFLE").contains("1")

    def extractCount(spark: org.apache.spark.sql.SparkSession, n: Int): Long = {
      import spark.implicits._
      // many small input partitions (8x slots): dynamic task scheduling
      // bounds stragglers from the heavy-tail docs
      val pages = spark.range(0, n, 1, spark.sparkContext.defaultParallelism * 8)
        .map(i => graft.gen.CorpusGen.pageFor(i))
      val input = if (shuffle) Skew.repartitionBySizeBucket(pages)(spark) else pages
      ExtractKernel.extract(input, ConversionOptions())(spark)
        .where("status = 'completed'").count()
    }

    /** One session per level: warm up inside it (codegen + JIT), then
      * best-of-3 — sandbox CPU noise produces multi-second outliers, so min
      * (uncontended steady state) is the honest estimator. */
    def measure(cores: Int): Double = {
      val spark = GraftSession.local(cores)
      try {
        extractCount(spark, nPages) // warmup pass, discarded
        (0 until 3).map { _ =>
          val t0 = System.nanoTime()
          require(extractCount(spark, nPages) > 0)
          (System.nanoTime() - t0) / 1e9
        }.min
      } finally spark.stop()
    }

    val secN = measure(nSmall)
    val sec4N = measure(nBig)
    val thrN = nPages / secN
    val thr4N = nPages / sec4N
    val eff = (thr4N / thrN) / 4.0
    println(f"""{"scaling":{"n_pages":$nPages,"cores_n":$nSmall,"sec_n":$secN%.2f,"pages_per_sec_n":$thrN%.1f,"cores_4n":$nBig,"sec_4n":$sec4N%.2f,"pages_per_sec_4n":$thr4N%.1f,"efficiency":$eff%.3f}}""")
  }
}
