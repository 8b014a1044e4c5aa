package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard conf: AQE + skew join on,
  * Kryo with registered kernel classes, UTC, shuffle partitions sized for
  * the local core count (never the 200 default).
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.kryo.registrationRequired", "false")
      .config("spark.kryo.classesToRegister", Seq(
        classOf[graft.model.Page],
        classOf[graft.model.ExtractResult],
        classOf[graft.model.Chunk],
        classOf[graft.model.TableData],
        classOf[graft.model.DocModel],
        classOf[graft.model.HeadingBlock],
        classOf[graft.model.ParaBlock],
        classOf[graft.model.ListBlock],
        classOf[graft.model.TableBlock],
        classOf[graft.model.CodeBlock],
        classOf[graft.html.Element],
        classOf[graft.html.TextNode],
      ).map(_.getName).mkString(","))
      .config("spark.ui.enabled", "false")
      // managed tables (the bucketed seen-digest corpus) live under tmp,
      // never inside the repo working dir
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse")

  def local(cores: Int): SparkSession = {
    val s = builder(s"local[$cores]", math.max(cores, 1)).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // The hybrid-search rank windows run post-limit on ≤ legK (~50) rows by
    // design (PlanSpec pins Window-above-TakeOrderedAndProject), so
    // WindowExec's single-partition warning is a false alarm here that spams
    // the bench tail (VERDICT r5 #7). Silence that one logger; every other
    // WARN still prints.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    s
  }
}
