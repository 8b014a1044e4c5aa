package graft.tools

import graft.gen.CorpusGen
import graft.model.ConversionOptions
import graft.pipeline.{ExtractKernel, GraftSession, Skew}

/** Per-stage cost breakdown of the Spark extraction pipeline:
  * generation / shuffle / kernel / result-encoding.
  * sbt "runMain graft.tools.StageProbe [nPages] [cores]" */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val cores = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val spark = GraftSession.local(cores)
    import spark.implicits._

    def pages = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .map(i => CorpusGen.pageFor(i))

    def time(label: String)(f: => Any): Unit = {
      // warm twice, measure best of 2
      f
      val times = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s best=${times.min}%6.2fs  pages/sec=${n / times.min}%9.1f")
    }

    time("gen-only (map+count)") {
      pages.map(p => p.html.length.toLong).reduce(_ + _)
    }
    time("gen+shuffle") {
      Skew.repartitionBySizeBucket(pages)(spark).map(p => p.html.length.toLong).reduce(_ + _)
    }
    time("gen+extract (no shuffle)") {
      ExtractKernel.extract(pages, ConversionOptions())(spark).where("status='completed'").count()
    }
    time("gen+extract, text only") {
      val opts = ConversionOptions()
      pages.mapPartitions(it => it.map(p => ExtractKernel.extractOne(p, opts).content.length.toLong)).reduce(_ + _)
    }
    time("full (shuffle+extract)") {
      val b = Skew.repartitionBySizeBucket(pages)(spark)
      ExtractKernel.extract(b, ConversionOptions())(spark).where("status='completed'").count()
    }
    spark.stop()
  }
}
