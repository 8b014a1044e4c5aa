package graft.tools

import graft.gen.CorpusGen
import graft.model.ConversionOptions
import graft.pipeline.ExtractKernel
import java.util.concurrent.atomic.AtomicLong

/** Pure-JVM thread-scaling probe for the extraction kernel (no Spark):
  * isolates kernel-level contention from Spark overheads.
  * sbt "runMain graft.tools.ThreadProbe [nPages] [threadsCsv]" */
object ThreadProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val levels = args.drop(1).headOption.getOrElse("1,8,32").split(",").map(_.toInt)
    val opts = ConversionOptions()

    // pre-generate pages once (generation excluded from measurement)
    val pages = (0 until n).map(i => CorpusGen.pageFor(i.toLong)).toArray

    // warmup
    pages.take(3000).foreach(p => ExtractKernel.extractOne(p, opts))

    val comp = java.lang.management.ManagementFactory.getCompilationMXBean
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    }

    for (rep <- 0 until 3; t <- levels) {
      val next = new AtomicLong(0)
      val gc0 = gcMs
      val jit0 = comp.getTotalCompilationTime
      val t0 = System.nanoTime()
      val threads = (0 until t).map { _ =>
        new Thread(() => {
          var i = next.getAndIncrement()
          while (i < n) {
            ExtractKernel.extractOne(pages(i.toInt), opts)
            i = next.getAndIncrement()
          }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"rep=$rep threads=$t%2d  sec=$sec%6.2f  pages/sec=${n / sec}%8.1f  per-thread=${n / sec / t}%7.1f  gc+=${gcMs - gc0}%5dms jit+=${comp.getTotalCompilationTime - jit0}%6dms")
    }
  }
}
