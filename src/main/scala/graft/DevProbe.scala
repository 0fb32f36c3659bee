package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataTypes, DecimalType}

/** Dev scratch main for stage-level timing (not part of the contract).
  * Current experiment: the k-means "decimal tax" — exact DECIMAL(38,14)
  * vs DoubleType per-dimension sums in the Lloyd update step. */
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
    val fps = Dedup.winnowFingerprints(spark, sfDir)
    time("winnow-fps")(fps.write.format("noop").mode("overwrite").save())
    println(s"[probe] fp rows = ${fps.count()}")
    val df = fps.groupBy(org.apache.spark.sql.functions.col("fp"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("df"))
    time("winnow-df")(df.write.format("noop").mode("overwrite").save())
    df.orderBy(org.apache.spark.sql.functions.col("df").desc).show(10)
    spark.stop()
  }
}
