package graft.mr

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Chaos analog of the reference's crash test
  * (/root/reference/src/mrapps/crash.go + test-mr.sh:283-330): a map task
  * fails on its first attempt; Spark re-executes it; the job must succeed
  * and the output must be identical to the no-crash run — i.e. duplicate
  * *execution* happens (crash.go's whole point, verified like jobcount's
  * marker files via an attempt counter) but never duplicate *output*
  * (attempt-scoped shuffle files + commit protocol, fixing the reference's
  * F4 append bug, worker.go:52).
  */
object ChaosSpec {
  val mapInvocations = new AtomicInteger(0)
}

class ChaosSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  test("task retry: crash on first attempt, output equals no-crash golden") {
    val dir = Files.createTempDirectory("mr-chaos")
    Files.writeString(dir.resolve("a.txt"), "x y z x y x")
    Files.writeString(dir.resolve("b.txt"), "y z q z z")

    val golden = MRJob.mergedOutput(spark, Seq(dir.toString + "/*.txt"),
      Apps.WordCount.map, Apps.WordCount.reduce, nReduce = 3)

    ChaosSpec.mapInvocations.set(0)
    val crashingMap: MRJob.MapF = (f, c) => {
      ChaosSpec.mapInvocations.incrementAndGet()
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0 && tc.partitionId() == 0)
        throw new RuntimeException("injected crash (first attempt)")
      Apps.WordCount.map(f, c)
    }
    val got = MRJob.mergedOutput(spark, Seq(dir.toString + "/*.txt"),
      crashingMap, Apps.WordCount.reduce, nReduce = 3)

    assert(got == golden, "output after crash-retry differs from golden")
    // duplicate execution DID happen (like jobcount's marker-file count)
    assert(ChaosSpec.mapInvocations.get() > 2,
      s"expected a retried attempt, saw ${ChaosSpec.mapInvocations.get()} invocations")
  }
}
