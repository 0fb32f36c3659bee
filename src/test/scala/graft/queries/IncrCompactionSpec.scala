package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** q196 incremental-compaction invariants: the merged ledger equals the
  * monolithic append-order replay bit-for-bit (value-level correctness
  * is also oracle-gated), and — the posture's whole point — the
  * standing bins below the straddle point are untouched by the ingest. */
class IncrCompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001
  private val b = org.apache.spark.sql.graftbridge.Bridge

  test("q196 merged ledger equals a driver-side monolithic append-order replay") {
    val df = Layout.q196(spark, dir)
    val merged = df.collect()
    b.freeIfDirectCheckpoint(df)
    val cap = 4096L
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, _) => (id % 10 >= 7, id) }
    var acc = 0L
    val expect = docs.map { case (id, sz) =>
      val bin = acc / cap; acc += sz; (bin, id, sz, id % 10 >= 7)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (bin, ms) =>
      (bin, ms.length.toLong, ms.map(_._3).sum, ms.map(_._2).min,
        ms.map(_._2).max, ms.count(_._4).toLong)
    }
    assert(merged.length == expect.length, "bin count")
    merged.zip(expect).foreach {
      case (got, (bin, n, bytes, first, last, bf)) =>
        assert(got.getLong(0) == bin && got.getLong(1) == n &&
          got.getLong(2) == bytes && got.getLong(3) == first &&
          got.getLong(4) == last && got.getLong(7) == bf,
          s"bin $bin mismatch: $got")
    }
  }

  test("q196 ingest never re-bins the standing corpus below the straddle bin") {
    val dfM = Layout.q196(spark, dir)
    val merged = dfM.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    b.freeIfDirectCheckpoint(dfM)
    val dfS = Layout.q196Standing(spark, dir)
    val standing = dfS.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    b.freeIfDirectCheckpoint(dfS)
    assert(standing.nonEmpty)
    val straddle = standing.keys.max
    val untouched = standing.keys.filter(_ < straddle)
    assert(untouched.nonEmpty, "fixture must have >1 standing bin")
    untouched.foreach { bin =>
      assert(merged(bin) == standing(bin),
        s"standing bin $bin changed under ingest: " +
          s"${merged(bin)} vs ${standing(bin)}")
    }
    // the straddle bin only ever GAINS batch members
    val (sn, sb, sf, _) = standing(straddle)
    val (mn, mb, mf, _) = merged(straddle)
    assert(mn >= sn && mb >= sb && mf <= sf, "straddle bin lost members")
  }
}
