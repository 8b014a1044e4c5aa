package graft.tools

import graft.pipeline.GraftSession

/** Print the physical plan + timed count of one SparkEntry query.
  * sbt "runMain graft.tools.PlanProbe <queryName> [sfDir]" */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_dedup_ngram_jaccard")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local(16)
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
