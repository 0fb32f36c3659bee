package graft.mr

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerTaskStart}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** The reference's parallelism probes re-expressed as a scheduler
  * assertion: mtiming (mrapps/mtiming.go:19-62) proves ≥2 map tasks run
  * CONCURRENTLY, rtiming (mrapps/rtiming.go:17-60) the same for reduce
  * tasks. The reference detects overlap by having each task write
  * timestamped marker files and counting live peers; here a SparkListener
  * watches task start/end per stage and records the high-water concurrent
  * task count, with the map stage identified by shuffle-write records and
  * the reduce stage by shuffle-read records — no marker-file side channel
  * needed. User functions sleep (like the reference's time.Sleep(1s)) so
  * task runtimes overlap deterministically on local[4]. */
class TimingSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private class ConcurrencyListener extends SparkListener {
    val active = new ConcurrentHashMap[Int, AtomicInteger]()
    val highWater = new ConcurrentHashMap[Int, AtomicInteger]()
    val shuffleWriteStages = ConcurrentHashMap.newKeySet[Int]()
    val shuffleReadStages = ConcurrentHashMap.newKeySet[Int]()

    override def onTaskStart(e: SparkListenerTaskStart): Unit = {
      val a = active.computeIfAbsent(e.stageId, _ => new AtomicInteger)
        .incrementAndGet()
      highWater.computeIfAbsent(e.stageId, _ => new AtomicInteger)
        .getAndUpdate(m => math.max(m, a))
    }

    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      Option(active.get(e.stageId)).foreach(_.decrementAndGet())
      Option(e.taskMetrics).foreach { m =>
        if (m.shuffleWriteMetrics.recordsWritten > 0)
          shuffleWriteStages.add(e.stageId)
        if (m.shuffleReadMetrics.recordsRead > 0)
          shuffleReadStages.add(e.stageId)
      }
    }

    def maxConcurrent(stages: java.util.Set[Int]): Int = {
      var m = 0
      stages.forEach { s =>
        m = math.max(m, Option(highWater.get(s)).map(_.get()).getOrElse(0))
      }
      m
    }
  }

  test("≥2 map tasks and ≥2 reduce tasks run concurrently (mtiming/rtiming)") {
    val dir = Files.createTempDirectory("mr-timing")
    // 4 files → 4 map tasks on local[4]; 16 spread-out keys → all 4 reduce
    // partitions populated with near-certainty
    // letter-only words: WordCount tokenizes on \p{L}+, digits would merge keys
    val words = ('a' to 'p').map(c => s"word$c")
    (0 until 4).foreach { i =>
      Files.writeString(dir.resolve(s"f$i.txt"), words.mkString(" "))
    }
    val sleepyMap: MRJob.MapF = (f, c) => {
      Thread.sleep(500) // the reference's mtiming sleeps ~1 s per map task
      Apps.WordCount.map(f, c)
    }
    val sleepyReduce: MRJob.ReduceF = (k, vs) => {
      Thread.sleep(150) // ~4 keys/partition → ≥600 ms per reduce task
      Apps.WordCount.reduce(k, vs)
    }

    val listener = new ConcurrencyListener
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = MRJob.mergedOutput(spark, Seq(dir.toString + "/*.txt"),
        sleepyMap, sleepyReduce, nReduce = 4)
      assert(out.size == words.size)

      // listener bus is async — poll until the events drain
      val deadline = System.nanoTime() + 10_000_000_000L
      def mapConc = listener.maxConcurrent(listener.shuffleWriteStages)
      def redConc = listener.maxConcurrent(listener.shuffleReadStages)
      while ((mapConc < 2 || redConc < 2) && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(mapConc >= 2, s"map-stage max concurrency $mapConc — tasks ran serially")
      assert(redConc >= 2, s"reduce-stage max concurrency $redConc — tasks ran serially")
      info(s"max concurrent: map=$mapConc reduce=$redConc (4 cores)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
