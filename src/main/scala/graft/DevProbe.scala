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
    import graft.queries.EmbeddingQueries
    import graft.similarity.KMeans
    val vecs = EmbeddingQueries.vecs(spark, sfDir)
    def run(name: String, t: org.apache.spark.sql.types.NumericType): Unit =
      time(name) { // fit materializes eagerly (localCheckpoint per iter)
        val model = KMeans.fit(vecs, k = 10, iters = 3, sumType = t)
        KMeans.assign(vecs, model)
          .write.format("noop").mode("overwrite").save()
      }
    run("warmup-decimal", DecimalType(38, 14))
    (1 to 3).foreach(_ => run("kmeans-decimal", DecimalType(38, 14)))
    (1 to 3).foreach(_ => run("kmeans-double",
      DataTypes.DoubleType.asInstanceOf[org.apache.spark.sql.types.NumericType]))
    spark.stop()
  }
}
