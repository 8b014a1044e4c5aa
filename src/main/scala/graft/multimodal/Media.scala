package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import scala.util.Random

/** Multimodal columns for the training-data pipeline: image/audio/video as
  * opaque `binary` columns with typed metadata, processed by typed
  * `mapPartitions` batches (the JVM analog of a Pandas-UDF/mapInPandas
  * stage: one partition = one batch, kernels amortize per-batch setup).
  *
  * What is REAL here: container header parsing (PNG IHDR width/height,
  * WAV fmt/data chunks → sample rate/duration), schema, partitioning, the
  * batch-shaped UDF plumbing, and determinism. What is STUBBED (this
  * container has no image/audio codecs): pixel/sample decode — every
  * `*_STUB` feature derives from a seeded hash of the payload so outputs
  * are deterministic and schema-complete. Swap `StubCodecs` for real codec
  * calls on a cluster with the native libs.
  */
object Media {

  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      source_url: String,
  )

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int, // image/video; -1 otherwise
      height: Int,
      sample_rate: Int, // audio; -1 otherwise
      duration_ms: Long, // audio/video; -1 otherwise
      n_frames_sampled: Int, // video frame sampling; 0 otherwise
      feature_v: Array[Float], // 8-d STUB feature vector (deterministic)
  )

  // ------------------------------------------------------------ generators

  /** Deterministic synthetic media corpus (no external data). */
  def mediaFor(i: Long): MediaRow = {
    val rnd = new Random(0x51ed2701 ^ (i * 0x9e3779b97f4a7c15L))
    val kind = (i % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
    val bytes = kind match {
      case "image" => fakePng(64 + rnd.nextInt(1024), 64 + rnd.nextInt(768), rnd)
      case "audio" => fakeWav(8000 + 8000 * rnd.nextInt(5), 500 + rnd.nextInt(4000), rnd)
      case _ => fakeVideo(320 + 16 * rnd.nextInt(80), 240 + 16 * rnd.nextInt(45), 24 + rnd.nextInt(240), rnd)
    }
    MediaRow(i, kind, bytes, s"https://media.site${i % 97}.example/m/$i.$kind")
  }

  def mediaDs(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism * 4).map(i => mediaFor(i))
  }

  /** Valid PNG signature + IHDR with real width/height; payload garbage. */
  def fakePng(w: Int, h: Int, rnd: Random): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = java.nio.ByteBuffer.allocate(25)
    ihdr.putInt(13); ihdr.put("IHDR".getBytes); ihdr.putInt(w); ihdr.putInt(h)
    ihdr.put(8.toByte); ihdr.put(2.toByte); ihdr.put(0.toByte); ihdr.put(0.toByte); ihdr.put(0.toByte)
    out.write(ihdr.array(), 0, 25)
    val junk = new Array[Byte](64 + rnd.nextInt(2048))
    rnd.nextBytes(junk)
    out.write(junk)
    out.toByteArray
  }

  /** Valid RIFF/WAVE header (fmt + data sizes); samples garbage. */
  def fakeWav(sampleRate: Int, durationMs: Int, rnd: Random): Array[Byte] = {
    val nSamples = (sampleRate.toLong * durationMs / 1000).toInt
    val dataSize = nSamples * 2 // 16-bit mono
    val payload = new Array[Byte](math.min(dataSize, 4096)) // truncated junk payload
    rnd.nextBytes(payload)
    val bb = java.nio.ByteBuffer.allocate(44 + payload.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataSize); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1); bb.putShort(1)
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataSize)
    bb.put(payload)
    bb.array()
  }

  /** Minimal custom video container: magic + dims + frame count. */
  def fakeVideo(w: Int, h: Int, nFrames: Int, rnd: Random): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(24 + 512)
    bb.put("GVID".getBytes); bb.putInt(w); bb.putInt(h); bb.putInt(nFrames); bb.putInt(30)
    val junk = new Array[Byte](512)
    rnd.nextBytes(junk)
    bb.position(24); bb.put(junk)
    bb.array()
  }

  // --------------------------------------------------------------- parsing

  def pngDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 33 || (b(0) & 0xff) != 0x89 || b(1) != 'P') return None
    val bb = java.nio.ByteBuffer.wrap(b, 16, 8)
    Some((bb.getInt, bb.getInt))
  }

  def wavInfo(b: Array[Byte]): Option[(Int, Long)] = { // (sampleRate, durationMs)
    if (b.length < 44 || b(0) != 'R' || b(8) != 'W') return None
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val sampleRate = bb.getInt(24)
    val dataSize = bb.getInt(40)
    if (sampleRate <= 0) None
    else Some((sampleRate, dataSize.toLong / 2 * 1000 / sampleRate))
  }

  def videoInfo(b: Array[Byte]): Option[(Int, Int, Int, Int)] = { // (w, h, frames, fps)
    if (b.length < 24 || b(0) != 'G' || b(1) != 'V') return None
    val bb = java.nio.ByteBuffer.wrap(b, 4, 16)
    Some((bb.getInt, bb.getInt, bb.getInt, bb.getInt))
  }

  /** STUB codec layer — deterministic hash-derived features standing in for
    * pixel/sample decode (marked per the offline-container constraint). */
  object StubCodecs {
    def featureVector(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
      // ??? real decode would go here (libpng/ffmpeg); offline STUB:
      val v = new Array[Float](dim)
      var h = 1469598103934665603L
      var i = 0
      while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * 1099511628211L; i += 1 }
      var d = 0
      while (d < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        v(d) = ((h >>> 40).toInt % 1000) / 1000.0f
        d += 1
      }
      v
    }

    /** Deterministic frame-index sampling (every k-th frame, ≤ maxFrames). */
    def sampleFrameIndices(nFrames: Int, maxFrames: Int = 8): Array[Int] = {
      if (nFrames <= 0) return Array.empty
      val step = math.max(1, nFrames / maxFrames)
      (0 until nFrames by step).take(maxFrames).toArray
    }
  }

  // ------------------------------------------------------------- pipeline

  /** Batch feature extraction: one partition = one batch (mapInPandas
    * analog); per-row failures yield a schema-complete row with -1 dims. */
  def extractFeatures(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        try {
          val (w, h, sr, dur, frames) = m.kind match {
            case "image" =>
              val (iw, ih) = pngDims(m.bytes).getOrElse((-1, -1))
              (iw, ih, -1, -1L, 0)
            case "audio" =>
              val (asr, adur) = wavInfo(m.bytes).getOrElse((-1, -1L))
              (-1, -1, asr, adur, 0)
            case _ =>
              videoInfo(m.bytes) match {
                case Some((vw, vh, nf, fps)) =>
                  (vw, vh, -1, nf.toLong * 1000 / math.max(fps, 1), StubCodecs.sampleFrameIndices(nf).length)
                case None => (-1, -1, -1, -1L, 0)
              }
          }
          MediaFeatures(m.media_id, m.kind, m.bytes.length, w, h, sr, dur, frames,
            StubCodecs.featureVector(m.bytes))
        } catch {
          case _: Throwable =>
            MediaFeatures(m.media_id, m.kind, if (m.bytes == null) 0 else m.bytes.length,
              -1, -1, -1, -1L, 0, Array.empty[Float])
        }
      }
    }
  }

  /** Query entry: deterministic per-kind media feature stats over a PINNED
    * 600-row media corpus (ids 0..599 — `mediaFor` is deterministic per id,
    * so this set is identical at every sf, exactly the pinned-64-url recipe
    * of x_extract_stats64). Pinning makes the VALUES oracle sf-invariant:
    * the driver can verify at any scale and the hash still matches.
    * Regenerate via scripts/media_oracle_gen.py under golden discipline. */
  def qMediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val n = 600
    extractFeatures(mediaDs(spark, n))(spark)
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        max(col("width")).as("max_width"),
        max(col("sample_rate")).as("max_sample_rate"),
        sum(col("n_frames_sampled")).as("frames_sampled"),
        round(sum(aggregate(col("feature_v"), lit(0.0d), (a, v) => a + v)), 2).as("feature_mass_r"),
      )
      .orderBy(col("kind"))
  }
}
