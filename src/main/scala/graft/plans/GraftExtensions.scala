package graft.plans

import graft.functions._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Catalyst integration for the graft native expressions: registers
  * each codegen'd expression as a SQL function, so `spark.sql` users
  * (and the reference's compiled-SQL models) can call the text/vector
  * kernels without touching the Scala Column API.
  *
  * Two installation paths:
  *  - config: `spark.sql.extensions=graft.plans.GraftExtensions`
  *    (the standard extensions hook — applies at session build);
  *  - runtime: `GraftExtensions.installInto(spark)` for an already-
  *    running session (what `Engine` and the specs use).
  *
  * SQL surface:
  *  - `shingles(words [, n=3])`         → array<string> word n-grams
  *  - `ngrams(words, n)`                → array<string> all n-grams
  *  - `pair_combos(postings)`           → array<struct> doc pairs
  *  - `array_dot(a, b)`                 → double
  *  - `array_sq_dist(a, b)`             → double
  *  - `winnow_fingerprint(text [, k=8, w=16])` → array<bigint>
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intLit(fn: String, arg: String, e: Expression): Int = e match {
    case Literal(n: Int, _) => n
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getCanonicalName, name)

  /** (identifier, info, builder) triples — the exact shape
    * `SparkSessionExtensions.injectFunction` takes.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("shingles"), info("shingles", classOf[Shingles]), {
      case Seq(words) => Shingles(words, 3)
      case Seq(words, n) => Shingles(words, intLit("shingles", "n", n))
      case args => throw new IllegalArgumentException(
        s"shingles(words[, n]): got ${args.length} args")
    }),
    (FunctionIdentifier("ngrams"), info("ngrams", classOf[NGrams]), {
      case Seq(words, n) => NGrams(words, intLit("ngrams", "n", n))
      case args => throw new IllegalArgumentException(
        s"ngrams(words, n): got ${args.length} args")
    }),
    (FunctionIdentifier("pair_combos"), info("pair_combos", classOf[PairCombos]), {
      case Seq(postings) => PairCombos(postings)
      case args => throw new IllegalArgumentException(
        s"pair_combos(postings): got ${args.length} args")
    }),
    (FunctionIdentifier("array_dot"), info("array_dot", classOf[ArrayDot]), {
      case Seq(a, b) => ArrayDot(a, b)
      case args => throw new IllegalArgumentException(
        s"array_dot(a, b): got ${args.length} args")
    }),
    (FunctionIdentifier("array_sq_dist"), info("array_sq_dist", classOf[ArraySqDist]), {
      case Seq(a, b) => ArraySqDist(a, b)
      case args => throw new IllegalArgumentException(
        s"array_sq_dist(a, b): got ${args.length} args")
    }),
    (FunctionIdentifier("winnow_fingerprint"),
      info("winnow_fingerprint", classOf[WinnowFingerprint]), {
      case Seq(text) => WinnowFingerprint(text, 8, 16)
      case Seq(text, k, w) => WinnowFingerprint(text,
        intLit("winnow_fingerprint", "k", k), intLit("winnow_fingerprint", "w", w))
      case args => throw new IllegalArgumentException(
        s"winnow_fingerprint(text[, k, w]): got ${args.length} args")
    }))

  /** Register into an already-running session's function registry. */
  def installInto(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
