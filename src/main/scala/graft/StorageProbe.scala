package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r14, VERDICT r13 #3): measure the PROCESS-LIFETIME pinned
  * storage the query surface accumulates — run every declared query once
  * (the bench warmup's shape: builders fire, registry pins materialize,
  * per-invocation pins are freed by the storage contract), then print
  * every still-persisted RDD with its memory/disk footprint plus totals
  * and GC time. This is the number VERDICT r13 asked for: how much the
  * StandingState registry really holds in an 8 GiB driver at sf0.1, and
  * whether the heavy tail's regression is pin-driven memory pressure.
  *
  * `SPARK_GRAFT_PROBE_ONLY` restricts the sweep (comma list) so a single
  * tier's pins can be measured in isolation. */
object StorageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val excluded = Set("q28_dedup_jaccard", "q43_dedup_chargram",
      "q169_prefix_jaccard", "q170_prefix_chargram",
      "q51_percentiles", "q57_distribution")
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => excluded(q._1))
      .filter(q => only.forall(_.contains(q._1)))
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    val gc0 = gcMillis()
    queries.foreach { case (name, fn) =>
      val before = spark.sparkContext.getRDDStorageInfo
        .map(i => (i.memSize, i.diskSize)).foldLeft((0L, 0L)) {
          case ((m, d), (im, id)) => (m + im, d + id) }
      try {
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(df)
      } catch { case e: Throwable =>
        System.err.println(s"[probe] $name THREW ${e.getClass.getName}")
      }
      val after = spark.sparkContext.getRDDStorageInfo
        .map(i => (i.memSize, i.diskSize)).foldLeft((0L, 0L)) {
          case ((m, d), (im, id)) => (m + im, d + id) }
      val dMem = (after._1 - before._1) / 1e6
      val dDisk = (after._2 - before._2) / 1e6
      if (math.abs(dMem) + math.abs(dDisk) > 0.5)
        println(f"[probe] $name%-28s pinned delta mem=${dMem}%9.1f MB disk=${dDisk}%8.1f MB (now ${after._1 / 1e6}%9.1f MB mem)")
    }
    val infos = spark.sparkContext.getRDDStorageInfo.sortBy(-_.memSize)
    println(f"[probe] ===== persistent RDDs after one full sweep: ${infos.length}%d =====")
    infos.take(40).foreach { i =>
      println(f"[probe] rdd=${i.id}%6d parts=${i.numPartitions}%4d mem=${i.memSize / 1e6}%9.1f MB disk=${i.diskSize / 1e6}%8.1f MB ${i.storageLevel}")
    }
    val totMem = infos.map(_.memSize).sum / 1e6
    val totDisk = infos.map(_.diskSize).sum / 1e6
    val heap = Runtime.getRuntime
    println(f"[probe] TOTAL pinned: mem=${totMem}%.1f MB disk=${totDisk}%.1f MB across ${infos.length}%d RDDs")
    println(f"[probe] heap: used=${(heap.totalMemory - heap.freeMemory) / 1e6}%.0f MB max=${heap.maxMemory / 1e6}%.0f MB  gc=${gcMillis() - gc0}%d ms during sweep")
    spark.stop()
  }
}
