package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch main (not part of the contract). Current experiment:
  * inspect the analyzed Catalyst tree of the HOF dot-product pattern. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.sql(
      """SELECT aggregate(zip_with(array(1.0d, 2.0d), array(3.0d, 4.0d),
        |                          (x, y) -> x * y),
        |                 0.0d, (acc, v) -> acc + v) AS dp""".stripMargin)
    println(df.queryExecution.analyzed.expressions.head.treeString)
    df.show()
    spark.stop()
  }
}
