package graft

import graft.queries.GraphQueries
import org.scalatest.funsuite.AnyFunSuite

/** PageRank iteration core behind q_pagerank, proven against an
  * independent scalar reference loop on hand-sized graphs — the DataFrame
  * plan and the Map-based loop share only the spec text, so a bug in
  * either shows as a mismatch. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Scalar reference: same integer fixed-point recurrence, plain Scala. */
  private def refPageRank(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val S = GraphQueries.Scale
    val n = nodes.size
    val out = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).distinct }
    val tele = S * 15L / 100L / n
    var r = nodes.map(_ -> S / n).toMap
    for (_ <- 1 to iters) {
      val contrib = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, ts) <- out; t <- ts) contrib(t) += r(u) / ts.size
      r = nodes.map(v => v -> (tele + 85L * contrib(v) / 100L)).toMap
    }
    r
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] = {
    import spark.implicits._
    GraphQueries.pageRank(nodes.toDF("node"), edges.distinct.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("4-node cycle converges to the uniform rank") {
    val nodes = Seq(0L, 1L, 2L, 3L)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val got = run(nodes, edges, 8)
    val want = refPageRank(nodes, edges, 8)
    assert(got.view.mapValues(_._2).toMap == want)
    // cycle is symmetric: every node ends at the same rank, near Scale/4
    assert(got.values.map(_._2).toSet.size == 1)
    assert(math.abs(got(0L)._2 - GraphQueries.Scale / 4) < GraphQueries.Scale / 100)
    assert(got.values.forall(_._1 == 1L)) // outdeg
  }

  test("star graph: hub collects rank; spokes hold only teleport mass") {
    // spokes 1..4 all point at hub 0; hub points back at spoke 1
    val nodes = Seq(0L, 1L, 2L, 3L, 4L)
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L))
    val got = run(nodes, edges, 8)
    val want = refPageRank(nodes, edges, 8)
    assert(got.view.mapValues(_._2).toMap == want)
    val tele = GraphQueries.Scale * 15L / 100L / nodes.size
    // spokes 2..4 have no in-edges -> exactly teleport mass after round 1
    assert(Seq(2L, 3L, 4L).forall(got(_)._2 == tele))
    // the hub<->spoke-1 pair oscillates the bulk mass between them (hub
    // forwards everything to spoke 1 each round); both dominate the
    // teleport-only spokes regardless of the iteration parity
    assert(got(0L)._2 > got(2L)._2 && got(1L)._2 > got(2L)._2)
  }

  test("dangling node leaks its mass but still receives; ranks stay positive and bounded") {
    // 0 -> 1 -> 2, node 2 dangles (outdeg 0)
    val nodes = Seq(0L, 1L, 2L)
    val edges = Seq((0L, 1L), (1L, 2L))
    val got = run(nodes, edges, 8)
    val want = refPageRank(nodes, edges, 8)
    assert(got.view.mapValues(_._2).toMap == want)
    assert(got(2L)._1 == 0L) // outdeg 0 survives to the output
    val total = got.values.map(_._2).sum
    assert(total > 0L && total <= GraphQueries.Scale)
  }

  test("PageRank loop truncates lineage per round (plan must not grow with iterations)") {
    import spark.implicits._
    val nodes = (0L until 10L).toDF("node")
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("src", "dst")
    val r = GraphQueries.pageRank(nodes, edges, 8)
    // final frame = checkpointed ranks joined once with the (checkpointed)
    // outdeg side — a handful of plan lines, never 8 nested join trees
    val planLines = r.queryExecution.logical.treeString.linesIterator.size
    assert(planLines <= 16,
      s"expected a flat post-checkpoint plan, got $planLines lines:\n${r.queryExecution.logical.treeString}")
  }

  test("host-graph composition: link sinks out-rank teleport-only hosts, sf-invariant rows") {
    val rows = graft.queries.ExtractionQueries.xHostRank64(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byHost = rows.map(r => r._1 -> r).toMap
    assert(byHost.contains("ads.example") && byHost.contains("ref.example"))
    // ad/reference hosts are pure sinks: no outlinks, collect link mass
    val teleOnly = rows.map(_._3).min
    Seq("ads.example", "ref.example").foreach { h =>
      assert(byHost(h)._2 == 0L && byHost(h)._3 > teleOnly)
    }
    // every page host is present even when its page carried no links
    assert(rows.count(_._1.startsWith("site")) == 64)
  }

  /** Scalar HITS reference: same integer half-steps, plain Scala. */
  private def refHits(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] = {
    val S = 1000000L
    val es = edges.distinct
    var h = nodes.map(_ -> S).toMap
    var a = nodes.map(_ -> S).toMap
    def normalize(raw: Map[Long, Long]): Map[Long, Long] = {
      val tot = math.max(raw.values.sum, 1L)
      raw.map { case (k, v) => k -> v * S / tot }
    }
    for (_ <- 1 to iters) {
      h = normalize(nodes.map(u => u -> es.filter(_._1 == u).map(e => a(e._2)).sum).toMap)
      a = normalize(nodes.map(v => v -> es.filter(_._2 == v).map(e => h(e._1)).sum).toMap)
    }
    nodes.map(n => n -> (h(n), a(n))).toMap
  }

  private def runHits(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] = {
    import spark.implicits._
    GraphQueries.hits(nodes.toDF("node"), edges.distinct.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("HITS: star graph separates hubs from authorities; matches scalar reference") {
    // spokes 1..4 point at hub... authority 0; 0 points at 5
    val nodes = Seq(0L, 1L, 2L, 3L, 4L, 5L)
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 5L))
    val got = runHits(nodes, edges, 4)
    assert(got == refHits(nodes, edges, 4))
    // 0 is the dominant authority (all spokes point at it); spokes are the
    // hubs; 5's authority comes only from 0's hub score
    assert(Seq(1L, 2L, 3L, 4L).forall(s => got(s)._1 > got(s)._2))
    assert(got(0L)._2 > got(5L)._2 && got(0L)._2 > got(1L)._2)
  }

  test("HITS: cycle is symmetric; reference matches on a mixed graph") {
    val cycleNodes = Seq(0L, 1L, 2L)
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    val gotCycle = runHits(cycleNodes, cycle, 4)
    assert(gotCycle == refHits(cycleNodes, cycle, 4))
    assert(gotCycle.values.toSet.size == 1) // full symmetry
    val nodes = (0L until 8L).toSeq
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 2L), (4L, 5L), (2L, 6L))
    assert(runHits(nodes, edges, 4) == refHits(nodes, edges, 4)) // node 7 isolated
  }

  test("derived corpus graph: deterministic, self-loop-free, distinct") {
    val e = GraphQueries.qLinkGraph(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(e.nonEmpty)
    assert(e.forall { case (s, d) => s != d })
    assert(e.distinct.length == e.length)
    val again = GraphQueries.qLinkGraph(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(e.sameElements(again))
  }
}
