package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch main for stage-level timing (not part of the contract). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    import graft.dedup.Dedup
    val sets = Dedup.shingleHashes(spark, sfDir)
    time("shingleSets")(sets.write.format("noop").mode("overwrite").save())
    val sig = Dedup.minhashSignatures(sets)
    time("signatures")(sig.write.format("noop").mode("overwrite").save())
    time("signatures2")(sig.write.format("noop").mode("overwrite").save())
    val cached = sig.cache()
    time("sig-cache")(cached.count())
    time("pairs-full")(Dedup.minhashPairs(spark, sfDir, 0.7)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
