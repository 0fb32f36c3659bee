package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.TextQueries

/** Document deduplication operators for large-scale training-data pipelines.
  *
  * Four tiers, in increasing fuzziness — all pure DataFrame graphs, no
  * driver-side data, designed so every shuffle key is a small fixed-width
  * hash rather than document content:
  *
  *  - exact:       md5 hash-groupBy (TextQueries.q22)
  *  - canonical:   fingerprint of the sorted distinct word set — catches
  *                 token-reordered copies exactly
  *  - jaccard:     exact word-set Jaccard via inverted-index self-join —
  *                 the verifier for candidate pairs
  *  - minhash/LSH: signature + banded bucketing — the 100 TB path: cost is
  *                 O(docs × sig) + per-bucket pair generation, never all-pairs
  *  - simhash:     64-bit weighted fingerprint + hamming distance — catches
  *                 multiset-identical and lightly-edited docs
  */
object Dedup {

  /** Per-doc sorted distinct word set (the canonical token-set view). */
  def wordSets(spark: SparkSession, dir: String): DataFrame =
    TextQueries.tokens(spark, dir)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("word"))).as("words"))

  /** Canonical-content fingerprint dedup: md5 of the sorted distinct word
    * set. One narrow shuffle on a 32-byte key; finds reordered copies that
    * byte-exact dedup misses. */
  def fingerprintDups(spark: SparkSession, dir: String): DataFrame =
    wordSets(spark, dir)
      .select(col("doc_id"), md5(array_join(col("words"), " ")).as("fp"))
      .groupBy(col("fp"))
      .agg(
        count(lit(1)).as("n_docs"),
        array_join(sort_array(collect_set(col("doc_id").cast(StringType))), ",").as("docs"))
      .where(col("n_docs") > 1)
      .orderBy(col("fp"))

  /** Exact n-gram/word-set Jaccard similarity pairs via inverted-index
    * self-join: join on word, count co-occurrences, then J = i/(|A|+|B|-i).
    * All-integer arithmetic until the final division — deterministic across
    * engines. The word-level join is the textbook verifier; at 100 TB the
    * candidate set comes from minhashPairs and this runs per-candidate. */
  def jaccardPairs(spark: SparkSession, dir: String, threshold: Double): DataFrame = {
    val w = TextQueries.tokens(spark, dir).distinct()
    val sz = w.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = w.select(col("doc_id").as("d1"), col("word"))
    val b = w.select(col("doc_id").as("d2"), col("word"))
    val inter = a.join(b, Seq("word"))
      .where(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sz.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
      .join(sz.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))
      .withColumn("jaccard",
        round(col("i").cast(DoubleType) / (col("n1") + col("n2") - col("i")), 4))
      .where(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
      .orderBy(col("d1"), col("d2"))
  }

  val MinhashSigSize = 128
  val MinhashBands   = 32 // 32 bands × 4 rows

  /** MinHash signatures: sig[i] = min over words of xxhash64(word, i).
    * Computed entirely inside codegen'd higher-order functions — no UDF,
    * no shuffle beyond the word-set aggregation. */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    wordSets(spark, dir).select(
      col("doc_id"),
      transform(
        sequence(lit(0), lit(MinhashSigSize - 1)),
        i => array_min(transform(col("words"), w => xxhash64(w, i)))).as("sig"))

  /** MinHash + LSH banded candidate generation, then signature-estimated
    * similarity. Scale shape: explode to (band, bandHash) — a fixed 32 rows
    * per doc — self-join on the band bucket (never all-pairs), dedupe
    * candidates, estimate similarity from the full signatures.
    * Banding math: P(candidate) = 1-(1-j^4)^32, steep around j≈0.55. */
  def minhashPairs(spark: SparkSession, dir: String, estThreshold: Double): DataFrame = {
    val rows = MinhashSigSize / MinhashBands
    val sig = minhashSignatures(spark, dir)
    val banded = sig.select(
      col("doc_id"), col("sig"),
      explode(
        transform(
          sequence(lit(0), lit(MinhashBands - 1)),
          b => struct(
            b.as("band"),
            xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows)))).as("bh"))))
        .as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bh"))
    val l = banded.select(col("band"), col("bh"), col("doc_id").as("d1"), col("sig").as("s1"))
    val r = banded.select(col("band"), col("bh"), col("doc_id").as("d2"), col("sig").as("s2"))
    l.join(r, Seq("band", "bh"))
      .where(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), col("s1"), col("s2"))
      .dropDuplicates("d1", "d2")
      .withColumn("est_jaccard",
        round(
          size(filter(zip_with(col("s1"), col("s2"), (x, y) => x === y), b => b))
            .cast(DoubleType) / MinhashSigSize, 4))
      .where(col("est_jaccard") >= estThreshold)
      .select(col("d1"), col("d2"), col("est_jaccard"))
      .orderBy(col("d1"), col("d2"))
  }

  /** 64-bit SimHash: per token-with-count, each bit of xxhash64(word)
    * contributes ±count; the signature bit is the sign of the sum.
    * Identical word multisets → identical simhash (hamming 0). */
  def simhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextQueries.tokens(spark, dir)
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("cnt"))
    val contrib = toks.select(
      col("doc_id"),
      expr("transform(sequence(0, 63), b -> if(((xxhash64(word) >> b) & 1L) = 1L, cnt, -cnt))").as("v"))
    contrib
      .groupBy(col("doc_id"))
      .agg(aggregate(
        collect_list(col("v")),
        array_repeat(lit(0L), 64),
        (acc, x) => zip_with(acc, x, (p, q) => p + q)).as("vs"))
      .select(
        col("doc_id"),
        expr("aggregate(zip_with(vs, sequence(0, 63), (v, b) -> if(v > 0, shiftleft(1L, CAST(b AS INT)), 0L)), 0L, (a, x) -> a | x)")
          .as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming, candidates
    * blocked on matching 32-bit halves (pigeonhole: hamming<=3 implies at
    * least one exact half-match — no all-pairs join). */
  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, "half-blocking is only complete for hamming <= 3")
    val sig = simhashSignatures(spark, dir).select(
      col("doc_id"), col("simhash"),
      shiftright(col("simhash"), 32).as("hi"),
      col("simhash").bitwiseAND(0xFFFFFFFFL).as("lo"))
    def block(key: String): DataFrame = {
      val l = sig.select(col(key).as("k"), col("doc_id").as("d1"), col("simhash").as("h1"))
      val r = sig.select(col(key).as("k"), col("doc_id").as("d2"), col("simhash").as("h2"))
      l.join(r, Seq("k")).where(col("d1") < col("d2")).drop("k")
    }
    block("hi").unionByName(block("lo"))
      .dropDuplicates("d1", "d2")
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .where(col("hamming") <= maxHamming)
      .select(col("d1"), col("d2"), col("hamming").cast(IntegerType).as("hamming"))
      .orderBy(col("d1"), col("d2"))
  }
}
