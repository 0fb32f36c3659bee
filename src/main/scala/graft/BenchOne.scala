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
      if (explain) fn(spark, sfDir).explain("formatted")
      // time CONSTRUCTION + materialization + consume-then-free, exactly
      // like Bench.timeOne — checkpoint-at-construction queries (k-means,
      // components) do their work in fn() and would under-report if only
      // the write were timed. Warmup once, then min-of-3.
      def run(): Double = {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(df)
        t
      }
      run()
      val ts = (1 to 3).map(_ => run())
      println(f"[benchone] $name%-28s min=${ts.min}%.2fs  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
