package graft

import graft.pipeline.GraftSession

/** Driver benchmark: times every SparkEntry query on SPARK_GRAFT_SF_DIR at
  * local[SPARK_GRAFT_CPUS]; prints ONE JSON line. Headline extra:
  * extraction throughput (pages/sec) over the FIXED 160k-page benchmark
  * corpus ([[graft.tools.BenchCorpus]] — shared with ScalingBench, so the
  * headline and the scaling legs are directly comparable and independent
  * of the sf dir).
  *
  * Noise handling: this sandbox shows intermittent host CPU-steal windows
  * (identical sub-second queries occasionally take 30+ s), so every query
  * is timed twice and the minimum over steal-clean runs reported; the
  * headline extraction runs 3 times plus up to 6 backoff retries (20 s
  * apart) when a sustained storm contaminates every attempt. The JSON
  * carries the host steal-tick delta observed during the run for
  * transparency. Scaling evidence (N vs 4N) lives in
  * graft.tools.ScalingBench → BENCH.md.
  */
object Bench {

  private def stealTicks(): Long =
    try {
      val line = scala.io.Source.fromFile("/proc/stat").getLines().next()
      line.trim.split("\\s+").drop(1).map(_.toLong).lift(7).getOrElse(0L)
    } catch { case _: Throwable => 0L }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    val steal0 = stealTicks()

    // JVM/codegen warmup on the small sf so per-query numbers are not
    // first-query-pays-startup noise
    SparkEntry.entry(spark).count()
    // materialize + cache the pages corpus for this sf up front: corpus
    // synthesis is not part of the measured system (production reads a
    // pages table), so no single x_ query should be billed its one-time
    // generation cost
    graft.queries.ExtractionQueries.pagesDs(spark, sfDir).count()

    def timeOnce(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    /** (wall sec, steal ticks seen during it). A window that saw > ~1
      * stolen core on average is contamination, not our runtime. */
    def timeWithSteal(f: => Unit): (Double, Long) = {
      val s0 = stealTicks()
      val sec = timeOnce(f)
      (sec, stealTicks() - s0)
    }
    def clean(m: (Double, Long)): Boolean = m._2 <= math.max(60L, (100.0 * m._1).toLong)

    // Per-query: best of 2, plus up to 2 retries when BOTH runs were
    // steal-contaminated; a global retry budget bounds the worst case of a
    // sustained storm (the driver runs this unattended).
    var retryBudget = 64
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t = try {
        val runs = scala.collection.mutable.ArrayBuffer(
          timeWithSteal(fn(spark, sfDir).count()),
          timeWithSteal(fn(spark, sfDir).count()))
        var extra = 0
        while (!runs.exists(clean) && extra < 2 && retryBudget > 0) {
          runs += timeWithSteal(fn(spark, sfDir).count())
          extra += 1
          retryBudget -= 1
        }
        val usable = if (runs.exists(clean)) runs.filter(clean) else runs
        usable.map(_._1).min
      } catch { case _: Throwable => -1.0 }
      name -> t
    }

    // headline: pure extraction throughput (pages/sec) — a fresh kernel
    // pipeline over a materialized pages table (the production shape:
    // parquet scan → kernel; synthetic-corpus generation excluded, it is
    // not part of the measured system), NOT the cached x_* results.
    // Fixed 160k pages regardless of sf: short 20k-page windows (<1 s)
    // showed 4-5x variance from ambient host contention that steal ticks
    // don't capture; 160k amortizes it AND shares ScalingBench's cached
    // corpus dir, so the headline is directly comparable to the scaling
    // legs.
    val nPages = 160000
    val corpusDir = graft.tools.BenchCorpus.ensure(spark, nPages)
    // fresh session for the headline: the query-loop session carries 59
    // queries' worth of cached corpus, broadcasts and old-gen pressure,
    // which measured 2.5x slower than ScalingBench's fresh sessions on
    // the identical job — the headline should measure the kernel, not
    // this process's accumulated heap state
    spark.stop()
    val spark2 = GraftSession.local(cpus)
    def freshExtract(): Long = {
      import spark2.implicits._
      val pages = spark2.read.parquet(corpusDir).as[graft.model.Page]
      graft.pipeline.ExtractKernel.extract(pages, graft.model.ConversionOptions())(spark2)
        .where("status = 'completed'").count()
    }
    freshExtract() // warm
    val extractRuns = scala.collection.mutable.ArrayBuffer(
      (0 until 3).map(_ => timeWithSteal(freshExtract())): _*)
    var extractExtra = 0
    // storms here last minutes, not seconds: back off between retries so a
    // sustained window doesn't contaminate every attempt of an unattended
    // driver run (bounded: 6 retries x 20 s sleep)
    while (!extractRuns.exists(clean) && extractExtra < 6) {
      Thread.sleep(20000)
      extractRuns += timeWithSteal(freshExtract())
      extractExtra += 1
    }
    // headline_clean: whether the accepted measurement came from a
    // steal-clean window. When false (sustained storm outlasted all 6
    // backoff retries) the number is host noise, not engine speed — the
    // best CLEAN historical 32-core measurement is carried alongside so a
    // contaminated driver run is self-describing (VERDICT r2 #6). The
    // constant is the accepted clean best from BENCH.md methodology
    // (101,371 pages/s @ 32 cores, round-3 accepted 8→32 run, steal-1
    // leg, both-legs-clean discipline); update it when a new clean best
    // is recorded there.
    val headlineClean = extractRuns.exists(clean)
    val cleanBestPrior = 101371.0
    val extractSec =
      (if (headlineClean) extractRuns.filter(clean) else extractRuns).map(_._1).min
    val pagesPerSec = nPages / extractSec
    // headline_clean only certifies the steal counter was quiet — co-tenant
    // MEMORY-BANDWIDTH contention doesn't tick steal and has measured 4-5x
    // swings on this host (BENCH.md methodology). The explicit ratio vs the
    // recorded clean best makes a depressed-but-steal-quiet run
    // self-describing without hiding the measured number.
    val vsCleanBest = pagesPerSec / cleanBestPrior
    val stealDelta = stealTicks() - steal0

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"sf":"$sfDir%s","extract_pages":$nPages%d,"extract_sec":$extractSec%.3f,"extract_pages_per_sec":$pagesPerSec%.1f,"headline_clean":$headlineClean%b,"clean_best_prior_pages_per_sec":$cleanBestPrior%.1f,"headline_vs_clean_best":$vsCleanBest%.3f,"cpus":$cpus%d,"host_steal_ticks":$stealDelta%d}""")
    spark2.stop()
  }
}
