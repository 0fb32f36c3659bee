package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (forked JVM, built once). */
object SparkTest {
  // local[4,2]: 4 threads, maxFailures=2 — lets the chaos spec exercise
  // task retry (the reference's crash-test semantics, test-mr.sh:283-330)
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4,2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}
