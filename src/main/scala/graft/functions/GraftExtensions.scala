package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the native expressions: registers graft's custom
  * Catalyst kernels as SQL functions so `spark.sql("SELECT
  * minhash_sig(items, 128) ...")` works exactly like the Column API.
  *
  * Two entry points, same builders:
  *  - `GraftExtensions` — a `SparkSessionExtensions` injector for session
  *    construction (`spark.sql.extensions=graft.functions.GraftExtensions`
  *    or `builder.withExtensions`), the deployment shape for a cluster
  *    where users write SQL.
  *  - `GraftExtensions.register(spark)` — same functions onto an already
  *    running session's registry (notebooks, tests).
  *
  * Scalar config params (k, w, tables, bits) must be foldable literals —
  * they parameterize codegen, not per-row data.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // rewrite textbook HOF vector kernels to the fused native expressions
    ext.injectOptimizerRule(_ => NativeKernelRewrite)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }

  private def arity(fn: String, n: Int)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != n) throw new IllegalArgumentException(
        s"$fn expects $n arguments, got ${args.length}")
      b(args)
    }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.functions", name, usage)

  /** (name, info, builder) for every SQL-exposed native kernel. */
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim",
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two double arrays"),
      arity("cosine_sim", 2)(args => CosineSimExpr(args(0), args(1)))),
    ("dot_product",
      info("dot_product", "dot_product(a, b) - dot product of two double arrays"),
      arity("dot_product", 2)(args => DotProductExpr(args(0), args(1)))),
    ("minhash_sig",
      info("minhash_sig", "minhash_sig(itemHashes, k) - k-permutation MinHash signature"),
      arity("minhash_sig", 2)(args =>
        MinHashSigExpr(args(0), intArg(args(1), "minhash_sig", 2)))),
    ("hyperplane_lsh",
      info("hyperplane_lsh", "hyperplane_lsh(vec, tables, bits) - LSH bucket ids"),
      arity("hyperplane_lsh", 3)(args => HyperplaneLshExpr(args(0),
        intArg(args(1), "hyperplane_lsh", 2), intArg(args(2), "hyperplane_lsh", 3)))),
    ("winnow_fp",
      info("winnow_fp", "winnow_fp(text, k, w) - winnowed k-gram fingerprints"),
      arity("winnow_fp", 3)(args => WinnowFpExpr(args(0),
        intArg(args(1), "winnow_fp", 2), intArg(args(2), "winnow_fp", 3)))),
    ("nfc_normalize",
      info("nfc_normalize", "nfc_normalize(text) - Unicode NFC canonical composition"),
      arity("nfc_normalize", 1)(args => NfcNormalizeExpr(args(0)))),
    ("max_run_len",
      info("max_run_len",
        "max_run_len(arr) - longest adjacent equal run in a string array (max multiplicity when sorted)"),
      arity("max_run_len", 1)(args => MaxRunLenExpr(args(0)))),
    ("token_hash",
      info("token_hash",
        "token_hash(s) - portable 64-bit hash (poly31 + splitmix64), the oracle-exact sketch kernel"),
      arity("token_hash", 1)(args => TokenHashExpr(args(0)))))

  /** Register onto a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      org.apache.spark.sql.graftbridge.Bridge
        .registerFunction(spark, name, builder)
    }
}
