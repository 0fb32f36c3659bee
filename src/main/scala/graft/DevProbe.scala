package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch main (not part of the contract). Current experiment:
  * winnowPairs density at sf0.001 for the q80 spec parameters. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (ms <- Seq(8, 4, 2, 1)) {
      val n = graft.dedup.Dedup.winnowPairs(spark, "/root/testdata/sf0.001", ms).count()
      println(s"minShared=$ms pairs=$n")
    }
    spark.stop()
  }
}
