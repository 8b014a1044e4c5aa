package graft

import graft.model.Page
import graft.pipeline.Skew
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Skew handling: the salted size-bucket repartitioner must spread payload
  * cost uniformly even when a few rows are 1000x bigger (the giant-blob
  * case the prefetch-1 knob addressed in the reference, worker.py:40). */
class SkewSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("size-bucket salting balances bytes across partitions on a pathological corpus") {
    implicit val s = spark
    import s.implicits._
    // 970 tiny rows + 30 giant rows, adversarial keys: all giants share a
    // url prefix so plain hash(url) partitioning could clump them
    val rows = (0 until 970).map(i =>
      Page(s"https://t.example/small-$i", new Timestamp(0), new Array[Byte](1000), "", "en")) ++
      (0 until 30).map(i =>
        Page(s"https://t.example/giant-$i", new Timestamp(0), new Array[Byte](1000000), "", "en"))
    val ds = spark.createDataset(scala.util.Random.javaRandomToRandom(new java.util.Random(1)).shuffle(rows.toList))(implicitly)

    val parts = 8
    val balanced = Skew.repartitionBySizeBucket(ds, parts)
    val sizes = balanced.mapPartitions(it => Iterator.single(it.map(_.html.length.toLong).sum))
      .collect().filter(_ > 0)
    assert(sizes.length == parts, s"expected $parts non-empty partitions, got ${sizes.length}")
    val mean = sizes.sum.toDouble / sizes.length
    val maxOverMean = sizes.max / mean
    // perfect balance = 1.0; a single clumped partition would be ~8x
    assert(maxOverMean < 1.8, s"imbalanced: sizes=${sizes.toList} max/mean=$maxOverMean")
  }
}
