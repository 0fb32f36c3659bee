package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch main (not part of the contract). Current experiment:
  * Derby embedded JDBC round-trip (schema fidelity probe). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("derby").toString
    System.setProperty("derby.system.home", tmp)
    System.setProperty("derby.stream.error.file", tmp + "/derby.log")
    val url = s"jdbc:derby:$tmp/db;create=true"
    val orders = graft.core.Tables(spark, "/root/testdata/sf0.001", "orders")
    orders.printSchema()
    graft.sources.Formats.writeJdbc(orders, url, "orders_rt")
    val back = graft.sources.Formats.readJdbc(spark, url, "orders_rt")
    back.printSchema()
    println("rows=" + back.count() + " vs " + orders.count())
    val part = graft.sources.Formats.readJdbcPartitioned(
      spark, url, "orders_rt", "o_orderkey", 0L, 100000L, 4)
    println("part rows=" + part.count() + " rdd partitions=" + part.rdd.getNumPartitions)
    spark.stop()
  }
}
