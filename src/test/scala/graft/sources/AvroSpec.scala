package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.core.Tables

/** Avro connector round-trips (SURVEY §2.3): schema inferred back from
  * the self-describing container files, values loss-free across the
  * supported type matrix — scalars, timestamp-micros, binary, float
  * arrays, and NULLs. */
class AvroSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  private def canon(df: org.apache.spark.sql.DataFrame,
                    key: String): Seq[Seq[Any]] =
    df.orderBy(col(key)).collect().map(_.toSeq.map {
      case t: java.sql.Timestamp => t.getTime * 1000 + t.getNanos / 1000 % 1000
      case b: Array[Byte] => b.toSeq
      case x => x
    }).toSeq

  test("avro round-trip: customer (long/string/int/double) is loss-free") {
    val p = Files.createTempDirectory("avro").toString + "/c"
    val customer = Tables(spark, dir, "customer")
    AvroIO.writeAvro(customer, p)
    val back = AvroIO.readAvro(spark, p)
    assert(back.schema == customer.schema)
    assert(canon(back, "c_custkey") == canon(customer, "c_custkey"))
  }

  test("avro round-trip: events preserves timestamp-micros fidelity") {
    val p = Files.createTempDirectory("avro").toString + "/e"
    val events = Tables(spark, dir, "events").limit(500)
    AvroIO.writeAvro(events, p)
    val back = AvroIO.readAvro(spark, p)
    // round-trip preserves the SOURCE's timestamp flavor: a tz-less
    // parquet scan yields TIMESTAMP_NTZ (→ avro local-timestamp-micros),
    // an LTZ column yields TIMESTAMP (→ avro timestamp-micros)
    assert(back.schema("ts").dataType == events.schema("ts").dataType)
    assert(canon(back, "event_id") == canon(events, "event_id"))
  }

  test("avro round-trip: LTZ timestamp column maps to timestamp-micros") {
    import spark.implicits._
    val p = Files.createTempDirectory("avro").toString + "/ltz"
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789012")),
      (2L, java.sql.Timestamp.valueOf("2024-03-02 00:00:00.000001")))
      .toDF("id", "ts")
    AvroIO.writeAvro(df, p)
    val back = AvroIO.readAvro(spark, p)
    assert(back.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(canon(back, "id") == canon(df, "id"))
  }

  test("avro round-trip: embeddings float arrays are loss-free") {
    val p = Files.createTempDirectory("avro").toString + "/v"
    val emb = Tables(spark, dir, "embeddings")
    AvroIO.writeAvro(emb, p)
    val back = AvroIO.readAvro(spark, p)
    assert(canon(back, "vec_id") == canon(emb, "vec_id"))
  }

  test("avro round-trip: NULLs and binary survive; unsupported types fail loudly") {
    import spark.implicits._
    val p = Files.createTempDirectory("avro").toString + "/n"
    val df = Seq(
      (1L, Option("x"), Option(Array[Byte](1, 2, 3))),
      (2L, None: Option[String], None: Option[Array[Byte]]))
      .toDF("id", "s", "b")
    AvroIO.writeAvro(df, p)
    val back = AvroIO.readAvro(spark, p)
    assert(canon(back, "id") == canon(df, "id"))
    // nested struct → loud failure, never silent coercion
    val bad = Seq((1L, (2L, "x"))).toDF("id", "nested")
    val e = intercept[IllegalArgumentException] {
      AvroIO.sqlToAvro(bad.schema)
    }
    assert(e.getMessage.contains("unsupported"))
  }

  test("avro codec round-trip: deflate and snappy read back identically") {
    val base = Files.createTempDirectory("avro").toString
    val customer = Tables(spark, dir, "customer")
    val want = canon(customer, "c_custkey")
    val sizes = Seq("null", "deflate", "snappy").map { c =>
      val p = s"$base/$c"
      AvroIO.writeAvro(customer, p, codec = Some(c))
      assert(canon(AvroIO.readAvro(spark, p), "c_custkey") == want, s"codec $c")
      new java.io.File(p).listFiles
        .filter(_.getName.startsWith("part-")).map(_.length).sum
    }
    // compression actually engaged: deflate output strictly smaller than
    // the uncompressed container on this compressible table
    assert(sizes(1) < sizes(0), s"deflate ${sizes(1)} not smaller than null ${sizes(0)}")
  }

  test("avro reader-schema projection returns only the requested columns") {
    val p = Files.createTempDirectory("avro").toString + "/proj"
    val customer = Tables(spark, dir, "customer")
    AvroIO.writeAvro(customer, p)
    val got = AvroIO.readAvro(spark, p, columns = Seq("c_custkey", "c_acctbal"))
    assert(got.schema.fieldNames.toSeq == Seq("c_custkey", "c_acctbal"))
    assert(canon(got, "c_custkey") ==
      canon(customer.select(col("c_custkey"), col("c_acctbal")), "c_custkey"))
    val e = intercept[IllegalArgumentException] {
      AvroIO.readAvro(spark, p, columns = Seq("nope"))
    }
    assert(e.getMessage.contains("not in"))
  }

  test("avro write fans out per partition (no driver funnel)") {
    val p = Files.createTempDirectory("avro").toString + "/p"
    val df = Tables(spark, dir, "customer").repartition(3)
    AvroIO.writeAvro(df, p)
    val parts = new java.io.File(p).listFiles
      .map(_.getName).filter(_.startsWith("part-"))
    assert(parts.length == 3, s"expected 3 part files, got ${parts.toSeq}")
    assert(AvroIO.readAvro(spark, p).count() == df.count())
  }
}
