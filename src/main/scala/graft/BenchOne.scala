package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a single named query (or comma-list) once, with plan
  * printout on request. `runMain graft.BenchOne q29_dedup_minhash [explain]` */
object BenchOne {
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
    val explain = args.contains("explain")
    args.head.split(",").foreach { name =>
      val fn = SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      if (explain) df.explain("formatted")
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[benchone] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
