package graft.tools

import graft.SparkEntry
import graft.pipeline.GraftSession

/** Ad-hoc warm timer for a query subset: runMain graft.tools.QueryTime
  * <sfDir> <nameRegex> [reps=3]. Times each matching SparkEntry query
  * `reps` times warm (after one untimed warm run) and prints per-query
  * min/all with the steal ticks seen in each window — the local iteration
  * loop for targeted performance work (Bench times the whole surface; this
  * tool isolates a family without paying the full run).
  */
object QueryTime {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val pat = args(1).r
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    SparkEntry.entry(spark).count() // session warmup
    val names = SparkEntry.queries.keys.toSeq.sorted.filter(n => pat.findFirstIn(n).isDefined)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // per-query warm (cache fills, codegen)
      val runs = (0 until reps).map { _ =>
        graft.core.Steal.timeWithSteal(fn(spark, sfDir).count())
      }
      val best = runs.map(_._1).min
      val det = runs.map { case (s, st) => f"$s%.2fs/$st" }.mkString(" ")
      println(f"[querytime] $name%-28s min=$best%.3f s  runs: $det")
    }
    spark.stop()
  }
}
