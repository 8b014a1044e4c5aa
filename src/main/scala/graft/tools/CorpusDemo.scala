package graft.tools

import graft.gen.CorpusGen
import graft.model._
import graft.pipeline.ExtractKernel

/** Drive the corpus generator + extraction kernel locally (no Spark):
  * `sbt "runMain graft.tools.CorpusDemo [n] [showIdx]"`.
  * Prints a per-type status summary and the full extraction of one row.
  */
object CorpusDemo {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50)
    val show = args.drop(1).headOption.map(_.toInt).getOrElse(7)
    val opts = ConversionOptions()
    val pages = CorpusGen.pages(n)
    val results = pages.map(p => ExtractKernel.extractOne(p, opts))

    println("=== SUMMARY ===")
    results.groupBy(r => (r.document_type, r.status)).toSeq.sortBy(_.toString).foreach {
      case ((dt, st), rs) => println(f"$dt%-6s $st%-10s ${rs.size}%4d  avgBlocksLen=${rs.map(r => Option(r.content).map(_.length).getOrElse(0)).sum / rs.size}")
    }
    results.filter(_.status == "failed").take(5).foreach(r => println(s"FAILED ${r.url}: ${r.error}"))

    val r = results(show)
    println(s"=== ROW $show: ${r.url} (${r.document_type}, ${pages(show).html.length} bytes) ===")
    println("--- content ---")
    println(Option(r.content).getOrElse("<null>"))
    println(s"--- ${r.chunks.size} chunks, ${r.tables.size} tables, page_count=${r.page_count}, meta=${r.metadata.toSeq.sorted} ---")
    r.tables.take(2).foreach(t => println(s"table ${t.id} page=${t.page} headers=${t.headers}\n${t.markdown}"))
  }
}
