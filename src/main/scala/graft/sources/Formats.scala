package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-format connectors (SURVEY.md §2.3 "File formats / connectors").
  * The reference reads plain text and writes text lines
  * (/root/reference/src/mr/worker.go:82, 134); our engine exposes the full
  * DataFrameReader/Writer format matrix. These helpers pin the
  * deterministic options used across the library (header/compression) so
  * round-trips are loss-free. Avro lives in [[AvroIO]] (self-contained
  * connector — the spark-avro module is absent from this sandbox).
  */
object Formats {

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** CSV with header; schema supplied on read (header-only inference would
    * make every column a string). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** JSON lines (one object per row). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
  def readJson(spark: SparkSession, path: String,
               schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Text lines (the reference's only format). */
  def writeText(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").text(path)
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** JDBC (SURVEY §2.3 connectors row): every real pipeline eventually
    * reads a dimension from an RDBMS. The write fans out over the frame's
    * partitions (one connection each); the read is single-partition unless
    * `partitionColumn` bounds are given — for a dimension table that's the
    * right shape (read once, then `broadcast()` it into the fact join, as
    * q05 does with file-backed dims). Exercised in FormatsSpec against
    * embedded Derby (the JDBC driver Spark itself ships for metastores),
    * including decimal/timestamp fidelity. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: java.util.Properties = new java.util.Properties): Unit =
    df.write.mode("overwrite").jdbc(url, table, props)

  def readJdbc(spark: SparkSession, url: String, table: String,
               props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Parallel bounded read: `numPartitions` range-splits on a numeric
    * column — the scale form when the source table is large enough that a
    * single-connection read is the bottleneck. */
  def readJdbcPartitioned(spark: SparkSession, url: String, table: String,
                          partitionColumn: String, lower: Long, upper: Long,
                          numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lower, upper, numPartitions,
      new java.util.Properties)
}
