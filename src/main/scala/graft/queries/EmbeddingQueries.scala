package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Embedding-column queries over `embeddings` (vec_id, embedding
  * list<float>, label) — Q22 of SURVEY.md §2.4 plus the similarity-search
  * groundwork used by graft.similarity.
  */
object EmbeddingQueries {
  import Tables.{apply => t}

  /** Q23 — array ops on the embedding column (SURVEY Q22): schema sanity,
    * proves list<float> round-trips. */
  def q23(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(
        col("vec_id"), col("label"),
        size(col("embedding")).cast(IntegerType).as("dim"))
      .orderBy(col("vec_id"))
      .limit(50)

  /** Cosine similarity — native fused-loop Catalyst expression
    * (graft.functions.CosineSimExpr): single pass, no per-row array
    * allocation, whole-stage-codegen friendly, deterministic
    * left-to-right accumulation. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimExpr.cosineSim(a, b)

  /** Reference formulation via higher-order functions (zip_with +
    * aggregate fold) — semantically identical; kept as the test oracle for
    * the native expression. */
  def cosineHof(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    def norm(x: Column): Column = sqrt(dot(x, x))
    dot(a, b) / (norm(a) * norm(b))
  }

  /** Dot product — native fused-loop expression; on unit vectors this IS
    * cosine at one third the FLOPs (no per-pair norms). */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProductExpr.dot(a, b)

  /** Embedding cast float→double once, up front (all arithmetic in f64). */
  def vecs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(
        col("vec_id"), col("label"),
        transform(col("embedding"), _.cast(DoubleType)).as("v"))

  /** Unit-normalized embeddings: the O(1)-per-row normalization is paid
    * once at scan time so every pairwise kernel downstream (all-pairs
    * verify, LSH verify, IVF probe) is a bare dot product. `u` for a
    * zero-NORM vector is NULL (not all-NaN): the cosine kernel returns
    * NULL on a zero norm (Divide semantics), and dot(NULL, x) is NULL
    * too, so the dot-on-unit-vectors paths (annTopK, nearDupPairs) rank a
    * degenerate row exactly where the cosine paths do (NULLs last under
    * desc) instead of NaN-first. A vector with NaN ELEMENTS stays NaN
    * through both kernels — also consistent. */
  def vecsNorm(spark: SparkSession, dir: String): DataFrame = {
    val withV = vecs(spark, dir)
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    withV
      .select(
        col("vec_id"), col("label"),
        when(col("nrm") === 0.0d, lit(null).cast(ArrayType(DoubleType)))
          .otherwise(transform(col("v"), x => x / col("nrm"))).as("u"))
  }

  /** Per-vector symmetric int8 quantization: scale = max|v|/127,
    * code_i = floor(v_i/scale + 0.5) ∈ [-127, 127] (explicit floor —
    * engine-neutral, unlike half-even/half-up `round` variants). The
    * storage form of a 100 TB embedding corpus: 4 bytes/dim → 1 byte/dim
    * + one float scale. Zero vectors quantize to all-zero codes with
    * scale 0. */
  def quantizeInt8(v: Column): Column = {
    val s = array_max(transform(v, abs(_))) / 127.0d
    struct(
      s.as("scale"),
      when(s === 0.0d, transform(v, _ => lit(0)))
        .otherwise(transform(v, x => floor(x / s + 0.5d).cast(IntegerType)))
        .as("codes"))
  }

  /** q92 — mean-pooled per-label centroids: the embedding AGGREGATE tier
    * (class prototypes / cluster summaries / diversity pruning all start
    * from a per-group mean vector). The vector column is exploded to
    * (label, dim, x) and aggregated per (label, dim) — a HIGH-cardinality
    * key (labels × dims) that spreads evenly, with map-side partials, so
    * at corpus scale no reducer ever sees more than one dimension slice
    * of one label. Determinism across engines: each component is widened
    * float→double (exact), ROUNDED to 8 decimals, then summed as DECIMAL
    * (order-independent — the q74 pattern); the mean divides once and
    * rounds at the end. */
  def q92(spark: SparkSession, dir: String): DataFrame =
    vecs(spark, dir)
      .select(col("label"), posexplode(col("v")))
      .select(col("label"), col("pos"),
        round(col("col"), 8).cast(DecimalType(20, 8)).as("x"))
      .groupBy(col("label"), col("pos"))
      .agg(
        count(lit(1)).as("n_vecs"),
        round(sum(col("x")).cast(DoubleType) / count(lit(1)), 6).as("mean_v"))
      .select(col("label"), col("pos").cast(IntegerType).as("dim"),
        col("n_vecs"), col("mean_v"))
      .orderBy(col("label"), col("dim"))

  /** q67 — quantization fidelity accounting per label: reconstruction
    * error of the int8 codes (max and exact-decimal mean of per-vector
    * max |dequant − v|). The per-row pipeline (quantize → dequantize →
    * error) is pure double arithmetic in list order — engine-neutral, so
    * unlike the hash-dependent similarity ops this one carries a DuckDB
    * oracle. */
  def q67(spark: SparkSession, dir: String): DataFrame = {
    val q = quantizeInt8(col("v"))
    val dq = transform(
      col("q.codes"), c => c.cast(DoubleType) * col("q.scale"))
    vecs(spark, dir)
      .withColumn("q", q)
      .withColumn("verr",
        array_max(zip_with(dq, col("v"), (a, b) => abs(a - b))))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        round(max(col("verr")), 6).as("max_err"),
        round(
          sum(round(col("verr"), 8).cast(DecimalType(18, 8)))
            .cast(DoubleType) / count(lit(1)), 6).as("avg_err"))
      .orderBy(col("label"))
  }

  /** q213 — EMBEDDING-SPACE DRIFT: per label, the cosine between the
    * BASE corpus centroid (vec_id mod 10 < 7, the standing state) and
    * the incoming BATCH centroid — the vector-space sibling of q191's
    * categorical PSI, and the check an embedding-backed retrieval stack
    * runs on every ingest ("did the new data move the space?"). A
    * cosine near 1 means the batch lands where the base lives; a dip
    * flags distribution shift in exactly the label that moved.
    *
    * Determinism: per-dimension means are DECIMAL sums (exact,
    * order-free) cast to double for ONE division; the 64 per-dim means
    * then fold into dot/norms in a PINNED left-to-right order over the
    * dim-sorted array (the q204 discipline), so both engines compute
    * the identical cosine. Scale shape: one (label, dim) partial-agged
    * aggregate over the exploded vectors (bounded keys: labels × 64),
    * one labels-row fold — corpus touched once, no window over data. */
  def q213(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        (pmod(col("vec_id"), lit(10L)) < 7L).as("is_base"),
        posexplode(transform(col("embedding"), _.cast(DoubleType))))
      .withColumnsRenamed(Map("pos" -> "dim", "col" -> "v"))
    val byDim = e.groupBy(col("label"), col("dim"))
      .agg(
        sum(when(col("is_base"), col("v")).otherwise(lit(0.0d))
          .cast(DecimalType(28, 14))).as("sb"),
        sum(when(!col("is_base"), col("v")).otherwise(lit(0.0d))
          .cast(DecimalType(28, 14))).as("sc"),
        sum(when(col("is_base"), 1L).otherwise(0L)).as("nb"),
        sum(when(!col("is_base"), 1L).otherwise(0L)).as("nc"))
      .select(col("label"), col("dim"),
        (col("sb").cast(DoubleType) / col("nb")).as("mb"),
        (col("sc").cast(DoubleType) / col("nc")).as("mc"))
    def fold(arr: Column): Column =
      aggregate(arr, lit(0.0d), (acc, x) => acc + x)
    byDim.groupBy(col("label"))
      .agg(
        transform(array_sort(collect_list(struct(col("dim"), col("mb")))),
          x => x.getField("mb")).as("mbs"),
        transform(array_sort(collect_list(struct(col("dim"), col("mc")))),
          x => x.getField("mc")).as("mcs"))
      .select(col("label"),
        round(
          fold(zip_with(col("mbs"), col("mcs"), (a, b) => a * b)) /
            (sqrt(fold(zip_with(col("mbs"), col("mbs"), (a, b) => a * b))) *
              sqrt(fold(zip_with(col("mcs"), col("mcs"), (a, b) => a * b)))),
          6).as("centroid_cosine"))
      .join(t(spark, dir, "embeddings").groupBy(col("label"))
        .agg(
          sum(when(pmod(col("vec_id"), lit(10L)) < 7L, 1L).otherwise(0L))
            .as("n_base"),
          sum(when(pmod(col("vec_id"), lit(10L)) >= 7L, 1L).otherwise(0L))
            .as("n_batch")), Seq("label"))
      .select(col("label"), col("n_base"), col("n_batch"),
        col("centroid_cosine"))
      .orderBy(col("label"))
  }
}
