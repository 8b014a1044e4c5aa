package graft.tools

import graft.pipeline.GraftSession

/** Optimization-round plan evidence: dump `explain("formatted")` for every
  * SparkEntry query to `plans/r06/<query>_<suffix>.txt` (suffix = before |
  * after), so plan-shape claims in OPTIMIZATION_r06.md are checkable
  * without running Spark.
  *
  *   sbt "runMain graft.tools.R6PlanDump <suffix> [sfDir] [nameRegex]"
  *
  * Note: queries whose CONSTRUCTION already runs jobs (iterative
  * checkpointed pipelines, bounded driver collects) execute those parts
  * during the dump; the written plan is the final query's formatted plan,
  * exactly what `.explain("formatted")` prints.
  */
object R6PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val pat = args.lift(2).map(_.r)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    val outDir = java.nio.file.Paths.get("plans/r06")
    java.nio.file.Files.createDirectories(outDir)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => pat.forall(_.findFirstIn(n).isDefined))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"), txt.getBytes("UTF-8"))
        println(s"[plandump] $name ok")
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
