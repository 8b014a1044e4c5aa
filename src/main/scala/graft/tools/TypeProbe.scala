package graft.tools

import graft.gen.CorpusGen
import graft.model.ConversionOptions
import graft.pipeline.ExtractKernel

/** Per-document-type kernel cost breakdown (pure JVM, no Spark): decides
  * whether a format-specific optimization (e.g. OOXML subtree-scan
  * fusion, SURVEY §9.4) is worth its complexity.
  * sbt "runMain graft.tools.TypeProbe [nPages]" */
object TypeProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val opts = ConversionOptions()
    val pages = (0 until n).map(i => CorpusGen.pageFor(i.toLong)).toArray
    // warmup
    pages.take(3000).foreach(p => ExtractKernel.extractOne(p, opts))

    val sums = scala.collection.mutable.Map.empty[String, (Long, Long)] // type -> (ns, count)
    pages.foreach { p =>
      val t0 = System.nanoTime()
      val r = ExtractKernel.extractOne(p, opts)
      val dt = System.nanoTime() - t0
      val (s, c) = sums.getOrElse(r.document_type, (0L, 0L))
      sums(r.document_type) = (s + dt, c + 1)
    }
    val total = sums.values.map(_._1).sum.toDouble
    println("type           docs   share%     us/doc")
    sums.toSeq.sortBy(-_._2._1).foreach { case (t, (ns, c)) =>
      println(f"$t%-10s $c%8d ${ns / total * 100}%7.1f%% ${ns / 1000.0 / c}%10.1f")
    }
  }
}
