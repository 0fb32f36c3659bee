package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch main (not part of the contract). Current experiment:
  * does AQE stage reuse collapse q74's triple tf consumption and q65's
  * self-join sides? (executed-plan inspection after collect) */
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
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (name <- Seq("q121_source_simmatrix", "q124_incr_sparse_neardup")) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val reused = plan.linesIterator.count(_.contains("ReusedExchange"))
      val scans = plan.linesIterator.count(_.contains("Scan parquet"))
      val reusedStage = plan.linesIterator.count(_.contains("ReusedQueryStage")) +
        plan.linesIterator.count(_.contains("StageReuse"))
      println(s"[$name] ReusedExchange=$reused ScanParquet=$scans stage=$reusedStage")
    }
    spark.stop()
  }
}
