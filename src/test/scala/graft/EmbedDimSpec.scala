package graft

import graft.embed.HashEmbedder
import graft.model._
import graft.pipeline.ExtractKernel
import org.scalatest.funsuite.AnyFunSuite

/** Configurable embedding dimension (reference embeddings.py:20-47 reads
  * EMBEDDING_MODEL and exposes embedding_dimension; VERDICT r1 missing-item
  * 3). Envelope semantics must hold at every dim: zero-for-blank, L2 norm,
  * determinism. */
class EmbedDimSpec extends AnyFunSuite {

  test("default dim stays 384") {
    assert(HashEmbedder.embed("hello world").length == 384)
  }

  test("non-default dims keep the envelope semantics") {
    for (dim <- Seq(8, 128, 768)) {
      val v = HashEmbedder.embed("the quick brown fox", dim)
      assert(v.length == dim)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5, s"dim $dim norm $norm")
      // blank -> exact zero vector at the requested dim
      val z = HashEmbedder.embed("   \t\n", dim)
      assert(z.length == dim && z.forall(_ == 0.0f))
      // deterministic
      assert(HashEmbedder.embed("the quick brown fox", dim).sameElements(v))
    }
  }

  test("kernel threads embeddingDim through ConversionOptions") {
    val page = graft.gen.CorpusGen.pageFor(0L)
    val r = ExtractKernel.extractOne(page,
      ConversionOptions(outputFormat = OutputFormat.Text, generateEmbeddings = true, embeddingDim = 128))
    assert(r.status == TaskStatus.Completed)
    assert(r.chunks.nonEmpty)
    assert(r.chunks.forall(_.embedding.length == 128))
  }

  test("out-of-range dim rejected at the options envelope") {
    intercept[IllegalArgumentException](ConversionOptions(embeddingDim = 4))
    intercept[IllegalArgumentException](ConversionOptions(embeddingDim = 8192))
  }
}
