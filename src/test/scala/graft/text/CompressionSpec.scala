package graft.text

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** q77 compression-ratio invariants (no cross-engine oracle — deflate
  * byte counts are zlib-build-specific; what matters is the ORDERING the
  * signal induces and its run-to-run determinism). */
class CompressionSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  // srcRepeat: one character repeated — compresses to almost nothing.
  // srcNoise: LCG-generated pseudo-random letters — near-incompressible.
  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("compress").toString
    import spark.implicits._
    def noise(seed: Long, n: Int): String = {
      val sb = new StringBuilder
      var x = seed
      (0 until n).foreach { _ =>
        x = (x * 6364136223846793005L + 1442695040888963407L)
        sb.append(('a' + ((x >>> 33) % 26)).toChar)
      }
      sb.toString
    }
    Seq(
      (0L, "a" * 2000, "en", "srcRepeat", 2000L),
      (1L, "b" * 2000, "en", "srcRepeat", 2000L),
      (2L, noise(1L, 2000), "en", "srcNoise", 2000L),
      (3L, noise(2L, 2000), "en", "srcNoise", 2000L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    dir
  }

  test("repetitive text compresses far better than high-entropy text") {
    val got = TextAnalysis.compressionStats(spark, fixtureDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4))).toMap
    val (nRep, rawRep, ratioRep) = got("srcRepeat")
    val (nNoi, rawNoi, ratioNoi) = got("srcNoise")
    assert(nRep == 2 && nNoi == 2)
    assert(rawRep == 4000L && rawNoi == 4000L)
    assert(ratioRep < 0.05, s"repeated text ratio $ratioRep not near 0")
    assert(ratioNoi > 0.5, s"noise ratio $ratioNoi unexpectedly compressible")
  }

  test("the signal is deterministic run to run") {
    val a = TextAnalysis.compressionStats(spark, fixtureDir).collect().toSeq
    val b = TextAnalysis.compressionStats(spark, fixtureDir).collect().toSeq
    assert(a == b)
  }
}
