package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Iterative numeric graph ranking — the operator class the dedup tier's
  * label propagation (boolean min-label) doesn't cover: PAGERANK over the
  * document similarity graph, measuring each document's duplication
  * CENTRALITY (a hub that shares rare content with many documents ranks
  * high — the doc a curation pass should inspect first, and a useful
  * keeper-selection signal beyond min-id).
  *
  * Graph: documents are linked when they share >= `minShared` distinct
  * RARE trigrams (corpus df <= `maxDf`) — the q119 candidate relation
  * before its cosine, so the edge builder inherits the inverted-index
  * join shape (linear in postings, never all-pairs; the df cap bounds
  * each posting list, and the b-side of the self-join is a
  * ReusedExchange of the a-side).
  *
  * Determinism (the KMeans problem, solved the q128 way): ranks are
  * INTEGER mass in 1e-12 units of the total. Each step floors twice —
  * per-vertex share `r DIV deg`, then the damping `(85 * share) DIV 100`
  * — so every contribution is an exact integer, sums are
  * order-independent, and 5 iterations are bit-stable under any
  * partitioning, AQE re-plan, or retry. The floor dust (and dangling
  * vertices' damped mass) evaporates rather than redistributing: a
  * documented simplification that keeps the oracle a pure SQL
  * recurrence — DuckDB replays all 5 iterations exactly.
  *
  * Scale: per iteration one edge-keyed join + one vertex-keyed aggregate
  * + one left join against the vertex set — the canonical distributed
  * PageRank step (no driver-side state but the doc count). Per-round
  * localCheckpoint keeps the plan O(1) deep exactly like
  * Components.connectedComponents; superseded rounds are freed as soon
  * as the next materializes.
  */
object GraphRank {

  /** Total rank mass, in integer units. */
  val Scale = 1000000000000L

  /** q129 — 5-iteration integer PageRank (damping 0.85) over the
    * shared-rare-trigram graph. Output: every document's final rank
    * mass and its link degree. STORAGE CONTRACT: direct localCheckpoint
    * result (the Components convention) — caller frees once consumed. */
  /** Shared-rare-trigram symmetric edge list with out-degree folded in
    * (src, dst, deg), materialized ONCE via localCheckpoint: the edge
    * pipeline must not re-run per iteration, and carrying deg on the
    * edge row saves a deg join in EVERY iteration. Caller frees. */
  private def rareTrigramEdges(docs: DataFrame, maxDf: Int,
                               minShared: Int): DataFrame = {
    // distinct (doc, gram) postings, df-capped: one tokenize subtree,
    // the pair side reuses its exchange (the q119 posture)
    val postings = Ranking.gramCountsOf(docs)
      .select(col("doc_id"), col("gram"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("gram"))))
      .where(col("df") <= maxDf)
      .select(col("doc_id"), col("gram"))
    val pairs = postings.as("a").join(postings.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
    val sym = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .union(pairs.select(col("d2").as("src"), col("d1").as("dst")))
    sym
      .withColumn("deg", count(lit(1)).over(Window.partitionBy(col("src"))))
      .localCheckpoint()
  }

  def q129(spark: SparkSession, dir: String, iters: Int = 5,
           maxDf: Int = 50, minShared: Int = 3): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val edges = rareTrigramEdges(docs, maxDf, minShared)

    val nDocs = docs.count()
    val r0 = Scale / nDocs               // uniform initial mass
    val base = (15L * r0) / 100L         // teleport term, exact floor

    val vertices = docs.select(col("doc_id")).localCheckpoint()
    var ranks = vertices.withColumn("r", lit(r0)).localCheckpoint()
    var prev = ranks
    try {
      for (_ <- 1 to iters) {
        val contrib = edges
          .join(ranks.select(col("doc_id").as("src"), col("r")), Seq("src"))
          .select(col("dst"), expr("(85 * (r DIV deg)) DIV 100").as("m"))
          .groupBy(col("dst"))
          .agg(sum(col("m")).as("m"))
        ranks = vertices
          .join(contrib, col("doc_id") === col("dst"), "left_outer")
          .select(col("doc_id"),
            (lit(base) + coalesce(col("m"), lit(0L))).as("r"))
          .localCheckpoint()
        org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(prev)
        prev = ranks
      }
      val out = ranks
        .join(edges.select(col("src").as("doc_id"), col("deg"))
          .dropDuplicates("doc_id"),
          Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("r").as("pagerank"),
          coalesce(col("deg"), lit(0L)).cast(IntegerType).as("n_links"))
        .orderBy(col("doc_id"))
        .localCheckpoint()
      out
    } finally {
      org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(prev)
      org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(vertices)
      org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(edges)
    }
  }

  /** q153 — TRUSTRANK-style seeded propagation (Gyöngyi et al. 2004,
    * "Combating Web Spam with TrustRank" — personalized PageRank whose
    * teleport vector is a TRUSTED SEED set): trust mass starts on, and
    * teleports back to, the documents of one curated source
    * (`seedSource`), then diffuses through the shared-rare-trigram
    * similarity graph. The curation read: unlabeled documents that
    * accumulate seed-adjacent mass are textually entangled with the
    * trusted slice — the propagation half of a quality-by-association
    * pass, where q129 measures raw duplication centrality.
    *
    * Same integer-exact recurrence as q129 (mass in 1e-12 units, double
    * floor per step, dust evaporates) — bit-stable under any
    * partitioning and replayed exactly by the DuckDB oracle; same
    * per-iteration shape (edge-keyed join + vertex aggregate + vertex
    * left join, O(1)-deep plans via per-round localCheckpoint). The
    * only deltas: r0 and the teleport term are nonzero ONLY on seeds.
    * STORAGE CONTRACT: direct localCheckpoint result — caller frees. */
  def q153(spark: SparkSession, dir: String, seedSource: String = "src0",
           iters: Int = 5, maxDf: Int = 50, minShared: Int = 3): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val edges = rareTrigramEdges(docs, maxDf, minShared)

    val nSeeds = docs.where(col("source") === seedSource).count()
    val r0 = Scale / nSeeds
    val base = (15L * r0) / 100L

    val vertices = docs
      .select(col("doc_id"), (col("source") === seedSource).as("seed"))
      .localCheckpoint()
    var ranks = vertices
      .select(col("doc_id"), when(col("seed"), r0).otherwise(0L).as("r"))
      .localCheckpoint()
    var prev = ranks
    try {
      for (_ <- 1 to iters) {
        val contrib = edges
          .join(ranks.select(col("doc_id").as("src"), col("r")), Seq("src"))
          .select(col("dst"), expr("(85 * (r DIV deg)) DIV 100").as("m"))
          .groupBy(col("dst"))
          .agg(sum(col("m")).as("m"))
        ranks = vertices
          .join(contrib, col("doc_id") === col("dst"), "left_outer")
          .select(col("doc_id"),
            (when(col("seed"), base).otherwise(0L) +
              coalesce(col("m"), lit(0L))).as("r"))
          .localCheckpoint()
        org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(prev)
        prev = ranks
      }
      val out = ranks
        .join(vertices, Seq("doc_id"))
        .select(col("doc_id"), col("seed"), col("r").as("trust"))
        .where(col("trust") > 0)
        .orderBy(col("doc_id"))
        .localCheckpoint()
      out
    } finally {
      org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(prev)
      org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(vertices)
      org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(edges)
    }
  }
}
