package graft.tools

import graft.pipeline.GraftSession

/** Time one SparkEntry query repeatedly (cache-warm after rep 1) with the
  * host steal ticks seen per rep — the single-query analog of Bench for
  * iterating on one operator without paying the whole surface.
  * sbt "runMain graft.tools.QueryProbe <query> [sfDir] [reps] [cpus]" */
object QueryProbe {
  private def stealTicks(): Long =
    try {
      val line = scala.io.Source.fromFile("/proc/stat").getLines().next()
      line.trim.split("\\s+").drop(1).map(_.toLong).lift(7).getOrElse(0L)
    } catch { case _: Throwable => 0L }

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: QueryProbe <query> [sfDir] [reps] [cpus]"))
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = args.lift(3).map(_.toInt).getOrElse(32)
    val spark = GraftSession.local(cpus)
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val s0 = stealTicks()
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"QUERYPROBE $name rep=$i sec=$sec%.3f rows=$n steal=${stealTicks() - s0}")
    }
    spark.stop()
  }
}
