package graft.mr

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Property tests (SURVEY.md §5 test plan item 3): algebraic laws of the
  * MR word count over arbitrary generated corpora (raw ScalaCheck
  * generators with fixed seeds — scalatestplus glue isn't available in the
  * offline dependency cache). */
class MRJobPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private val word = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
  private val doc = Gen.listOf(word).map(_.mkString(" "))

  private def countsOf(lines: Seq[String]): Map[String, Int] =
    lines.map { l =>
      val Array(w, n) = l.split(" ", 2); w -> n.toInt
    }.toMap

  private def sample(seed: Long): String =
    doc.pureApply(Gen.Parameters.default.withSize(30), Seed(seed))

  test("wordcount(a ++ b) == merge(wordcount(a), wordcount(b)) for generated docs") {
    (1L to 5L).foreach { s =>
      val (a, b) = (sample(s), sample(s + 100))
      val dirA = Files.createTempDirectory("prop")
      Files.writeString(dirA.resolve("a.txt"), a)
      val dirB = Files.createTempDirectory("prop")
      Files.writeString(dirB.resolve("b.txt"), b)

      val ca = countsOf(MRJob.mergedOutput(spark, Seq(dirA.toString),
        Apps.WordCount.map, Apps.WordCount.reduce, 2))
      val cb = countsOf(MRJob.mergedOutput(spark, Seq(dirB.toString),
        Apps.WordCount.map, Apps.WordCount.reduce, 2))
      val cab = countsOf(MRJob.mergedOutput(spark, Seq(dirA.toString, dirB.toString),
        Apps.WordCount.map, Apps.WordCount.reduce, 3))

      val merged = (ca.keySet ++ cb.keySet)
        .map(k => k -> (ca.getOrElse(k, 0) + cb.getOrElse(k, 0))).toMap
      assert(cab == merged, s"seed $s")
    }
  }
}
