package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.EmbeddingQueries.{vecsNorm}

/** Product quantization ANN (Jégou, Douze, Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search" — public literature): split
  * the embedding into `m` subvectors, learn a small L2 k-means codebook
  * per subspace, store each vector as `m` byte-sized codes, and answer
  * queries with ASYMMETRIC DISTANCE (ADC): the query precomputes its
  * distance to every sub-centroid (an m×k table), and each corpus
  * vector's approximate distance is the SUM of m table lookups — no
  * original vectors are touched at query time.
  *
  * This is the memory-bound ANN tier the IVF family (q33/q50/q63) does
  * not cover: IVF prunes WHICH vectors are scored; PQ compresses WHAT
  * is stored per vector (64 f32 dims → m codes), which is what makes a
  * 100 TB embedding corpus fit an index at all. The two compose (IVF-PQ)
  * by running this encoding inside each IVF cell.
  *
  * Scale shape: codebook training touches only subvectors (k·m centroid
  * rows of state, decimal-exact means — the annIvf update discipline);
  * encoding is map-only against the broadcast codebook; the ADC scan is
  * one broadcast join of the (q, s, code) distance table against the
  * exploded code column + a (q, vec) aggregate — linear in corpus ×
  * queries, shuffle keys are tiny (q_id, vec_id) pairs. Distance-table
  * entries are rounded to DECIMAL(18,9) so the per-pair ADC sum is
  * order-independent (the repo's decimal-exact discipline — a double
  * sum's accumulation order would jitter ranks across retries).
  */
object Pq {

  /** Squared L2 between two equal-length double arrays — an in-order
    * fold, deterministic per pair. */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, v) => acc + v)

  /** L2 k-means over one subspace's `(vec_id, sv)` rows: deterministic
    * init (first k by vec_id — the KMeans.fit convention), per-round
    * decimal-exact centroid means, `iters` rounds, per-round
    * localCheckpoint freed when superseded. Returns (code, cent). */
  private def kmeansL2(sub: DataFrame, k: Int, iters: Int): DataFrame = {
    var cents = sub.orderBy(col("vec_id")).limit(k)
      .select(col("sv"),
        (row_number().over(Window.orderBy(col("vec_id"))) - 1)
          .cast(IntegerType).as("code"))
      .select(col("code"), col("sv").as("cent"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val packed = cents
        .agg(array_sort(collect_list(struct(col("code"), col("cent"))))
          .as("cbs"))
      val assigned = sub.crossJoin(broadcast(packed))
        .select(col("vec_id"), col("sv"),
          aggregate(col("cbs"),
            struct(lit(-1).cast(IntegerType).as("code"),
              lit(Double.MaxValue).as("d2")),
            (acc, c) => {
              val d = l2sq(col("sv"), c.getField("cent"))
              when(d < acc.getField("d2"),
                struct(c.getField("code").as("code"), d.as("d2")))
                .otherwise(acc)
            }).getField("code").as("code"))
      val next = assigned
        .select(col("code"), posexplode(col("sv")))
        .groupBy(col("code"), col("pos"))
        .agg(sum(col("col").cast(DecimalType(28, 14))).as("s"),
          count(lit(1)).as("cnt"))
        .groupBy(col("code"))
        .agg(array_sort(collect_list(struct(col("pos"),
          (col("s").cast(DoubleType) / col("cnt")).as("v")))).as("dims"))
        .select(col("code"),
          transform(col("dims"), d => d.getField("v")).as("cent"))
        .localCheckpoint()
      org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(cents)
      cents = next
    }
    cents
  }

  /** q164 — PQ-ADC recall ledger: encode the (unit-normalized) corpus
    * with an m×k learned product codebook, answer the q32 query set via
    * ADC, and report per-query recall@k against the exact brute-force
    * top-k — the same honest-accounting shape as q76 (an ANN tier ships
    * WITH its measured recall or it ships unbounded). Differential by
    * construction → rows-only driver check; PqSpec pins recall bounds,
    * determinism, and the codebook's reconstruction-error contraction. */
  def q164(spark: SparkSession, dir: String, m: Int = 8, k: Int = 16,
           iters: Int = 3, kTop: Int = 10, nQueries: Int = 20,
           shortlistFactor: Int = 10): DataFrame = {
    val corpus = vecsNorm(spark, dir).where(col("u").isNotNull)
      .select(col("vec_id"), col("u")).localCheckpoint()
    try {
      val dim = corpus.select(size(col("u"))).head().getInt(0)
      require(dim % m == 0, s"dim $dim not divisible by m=$m")
      val sub = dim / m

      def subCol(s: Int): Column = slice(col("u"), s * sub + 1, sub)

      // one codebook per subspace, tagged with its subspace index
      val codebook = (0 until m).map { s =>
        kmeansL2(corpus.select(col("vec_id"), subCol(s).as("sv")), k, iters)
          .select(lit(s).as("s"), col("code"), col("cent"))
      }.reduce(_.unionByName(_)).localCheckpoint()

      try {
        val packed = codebook
          .agg(array_sort(collect_list(
            struct(col("s"), col("code"), col("cent")))).as("cbs"))

        // encode: per (vec, subspace), the nearest sub-centroid's code
        val subRows = corpus.select(col("vec_id"),
          posexplode(array((0 until m).map(subCol): _*)))
          .withColumnsRenamed(Map("pos" -> "s", "col" -> "sv"))
        val codes = subRows.crossJoin(broadcast(packed))
          .select(col("vec_id"), col("s"),
            aggregate(filter(col("cbs"), c => c.getField("s") === col("s")),
              struct(lit(-1).cast(IntegerType).as("code"),
                lit(Double.MaxValue).as("d2")),
              (acc, c) => {
                val d = l2sq(col("sv"), c.getField("cent"))
                when(d < acc.getField("d2"),
                  struct(c.getField("code").as("code"), d.as("d2")))
                  .otherwise(acc)
              }).getField("code").as("code"))

        // ADC distance table: query × subspace × code, decimal-rounded
        val queries = corpus.where(col("vec_id") < nQueries)
        val qSubRows = queries.select(col("vec_id").as("q_id"),
          posexplode(array((0 until m).map(subCol): _*)))
          .withColumnsRenamed(Map("pos" -> "s", "col" -> "qsv"))
        val dtable = qSubRows.join(broadcast(codebook), Seq("s"))
          .select(col("q_id"), col("s"), col("code"),
            round(l2sq(col("qsv"), col("cent")), 9)
              .cast(DecimalType(18, 9)).as("d2"))

        // ADC scan: m lookups per (query, vector), order-independent sum
        val adc = codes.join(broadcast(dtable), Seq("s", "code"))
          .where(col("vec_id") =!= col("q_id"))
          .groupBy(col("q_id"), col("vec_id"))
          .agg(sum(col("d2")).as("adc"))
        // shortlist-then-refine (the production PQ posture, Jégou §V.C):
        // ADC picks a `shortlist`-sized candidate set from codes alone;
        // only those candidates fetch their original vector for an exact
        // re-rank — bounded work (shortlist × queries exact dots), and
        // recall@k now only requires true neighbors to reach the
        // shortlist, not to survive quantization at rank k.
        val shortlist = shortlistFactor * kTop
        val wAdc = Window.partitionBy(col("q_id"))
          .orderBy(col("adc").asc, col("vec_id").asc)
        val cand = adc
          .withColumn("rank", row_number().over(wAdc))
          .where(col("rank") <= shortlist)
          .select(col("q_id"), col("vec_id"))
        val refined = cand
          .join(queries.select(col("vec_id").as("q_id"), col("u").as("qu")),
            Seq("q_id"))
          .join(corpus.select(col("vec_id"), col("u")), Seq("vec_id"))
          .select(col("q_id"), col("vec_id"),
            round(graft.functions.DotProductExpr.dot(col("qu"), col("u")), 4)
              .as("sim"))
        val wRef = Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("vec_id").asc)
        val approx = refined
          .withColumn("rank", row_number().over(wRef))
          .where(col("rank") <= kTop)
          .select(col("q_id"), col("vec_id").as("n_id"))

        val brute = Similarity.annTopK(spark, dir, kTop, nQueries)
          .select(col("q_id"), col("n_id"))
        val hits = brute.join(approx, Seq("q_id", "n_id"))
          .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
        // materialize (tiny: one row per query) BEFORE the pinned
        // codebook/corpus are freed — their lineage is truncated, so a
        // lazy result referencing them could not recompute after free
        brute.groupBy(col("q_id")).agg(count(lit(1)).as("n_true"))
          .join(hits, Seq("q_id"), "left_outer")
          .select(col("q_id"),
            coalesce(col("n_hit"), lit(0L)).cast(IntegerType).as("n_hit"),
            col("n_true").cast(IntegerType).as("n_true"),
            round(coalesce(col("n_hit"), lit(0L)).cast(DoubleType) /
              col("n_true"), 4).as("recall"))
          .orderBy(col("q_id"))
          .localCheckpoint()
      } finally {
        org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(codebook)
      }
    } finally {
      org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(corpus)
    }
  }
}
