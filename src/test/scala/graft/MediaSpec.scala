package graft

import graft.multimodal.Media
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Multimodal plumbing: real container-header parsing, stubbed codecs,
  * deterministic batch feature extraction through Spark. */
class MediaSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("png/wav/video header parsing is real (dims, rates, durations)") {
    val png = Media.fakePng(640, 480, new Random(1))
    assert(Media.pngDims(png).contains((640, 480)))
    val wav = Media.fakeWav(16000, 2000, new Random(2))
    assert(Media.wavInfo(wav).contains((16000, 2000L)))
    val vid = Media.fakeVideo(320, 240, 120, new Random(3))
    assert(Media.videoInfo(vid).contains((320, 240, 120, 30)))
  }

  test("frame sampling is deterministic and bounded") {
    assert(Media.StubCodecs.sampleFrameIndices(120, 8).toSeq == Seq(0, 15, 30, 45, 60, 75, 90, 105))
    assert(Media.StubCodecs.sampleFrameIndices(3, 8).toSeq == Seq(0, 1, 2))
    assert(Media.StubCodecs.sampleFrameIndices(0).isEmpty)
  }

  test("feature extraction through Spark: schema-complete, deterministic, per-kind") {
    implicit val s = spark
    val feats = Media.extractFeatures(Media.mediaDs(spark, 90)).collect()
    assert(feats.length == 90)
    assert(feats.forall(_.feature_v.length == 8))
    val images = feats.filter(_.kind == "image")
    assert(images.nonEmpty && images.forall(f => f.width > 0 && f.height > 0 && f.sample_rate == -1))
    val audio = feats.filter(_.kind == "audio")
    assert(audio.nonEmpty && audio.forall(f => f.sample_rate >= 8000 && f.duration_ms > 0))
    val video = feats.filter(_.kind == "video")
    assert(video.nonEmpty && video.forall(f => f.n_frames_sampled > 0 && f.width > 0))
    // determinism across runs
    val again = Media.extractFeatures(Media.mediaDs(spark, 90)).collect()
    assert(feats.sortBy(_.media_id).zip(again.sortBy(_.media_id)).forall {
      case (a, b) => a.feature_v.sameElements(b.feature_v) && a.width == b.width
    })
  }

  test("corrupt media bytes yield schema-complete fallback rows") {
    implicit val s = spark
    import s.implicits._
    val bad = spark.createDataset(Seq(
      Media.MediaRow(1, "image", Array[Byte](1, 2, 3), "u"),
      Media.MediaRow(2, "audio", Array.empty[Byte], "u"),
    ))(implicitly)
    val out = Media.extractFeatures(bad).collect().sortBy(_.media_id)
    assert(out(0).width == -1 && out(1).sample_rate == -1)
  }
}
