package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch main (not part of the contract). Current experiment:
  * q164 PQ-ADC recall — does the ledger return sane recall, and how long
  * does the codebook fit + encode + ADC scan take at each SF?
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries("q164_pq_recall")(spark, dir).collect()
      val t = (System.nanoTime() - t0) / 1e9
      val mean = rows.map(_.getDouble(3)).sum / rows.length
      println(f"[$dir] q164 rows=${rows.length} meanRecall=$mean%.3f t=$t%.1fs")
      println(rows.take(5).mkString(" | "))
    }
    spark.stop()
  }
}
