package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-word shingles of a string array, as a native Catalyst
  * expression.
  *
  * Rationale: the declarative formulation
  * `array_distinct(transform(sequence(...), i -> concat_ws(...)))` runs
  * interpreted (higher-order functions are CodegenFallback and evaluate
  * a lambda per element) and measured ~40 µs/row on 300-token docs —
  * 10 s for 5 k docs, recomputed on every join branch. This imperative
  * single-pass version is ~100× cheaper and keeps the same semantics:
  * order-of-first-occurrence distinct shingles, exactly what
  * `array_distinct(transform(...))` produces.
  */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  /** Codegen: call into this expression object. A plain CodegenFallback
    * would eject the WHOLE stage from whole-stage codegen (every
    * downstream expression in the stage then runs interpreted — md5
    * chains got 5-10× slower); delegating via a reference object keeps
    * the stage compiled.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shinglesExpr", this, classOf[Shingles].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (${classOf[ArrayData].getName}) $ref.nullSafeEval($c);")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val words = new Array[UTF8String](len)
    var i = 0
    while (i < len) { words(i) = arr.getUTF8String(i); i += 1 }
    val sep = Shingles.space
    val seen = new java.util.LinkedHashSet[UTF8String]()
    i = 0
    while (i <= len - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = words(i + j); j += 1 }
      seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)

  override def prettyName: String = "shingles"
}

object Shingles {
  private[functions] val space = UTF8String.fromString(" ")
}

/** ALL n-word shingles in order, multiplicity kept — the non-distinct
  * sibling of [[Shingles]], for repetition statistics (top-n-gram
  * frequency needs counts, which dedup would destroy). Same codegen
  * delegation, same single-pass eval.
  */
case class NGrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramsExpr", this, classOf[NGrams].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (${classOf[ArrayData].getName}) $ref.nullSafeEval($c);")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val words = new Array[UTF8String](len)
    var i = 0
    while (i < len) { words(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](len - n + 1)
    i = 0
    while (i <= len - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = words(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Shingles.space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): NGrams =
    copy(child = newChild)

  override def prettyName: String = "ngrams"
}

/** All unordered pairs from a posting list of `(doc_id, n)` structs —
  * the pair-generation kernel of inverted-index dedup. Given the
  * collect_list of documents sharing one shingle, emits
  * `(doc_a, na, doc_b, nb)` for every i<j with `doc_a < doc_b`
  * normalized, so the downstream pair aggregation is
  * order-independent even though collect_list order is not
  * deterministic.
  *
  * Replaces the exploded-postings SELF-JOIN formulation: that plan
  * scans + shingles the corpus twice and shuffles both join sides;
  * this one scans once and shuffles once (groupBy shingle) before the
  * pair agg. Same output-pair multiset — a shingle shared by k docs
  * contributes k(k-1)/2 pair rows either way.
  */
case class PairCombos(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("na", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("nb", LongType, nullable = false))), containsNull = false)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pairCombosExpr", this, classOf[PairCombos].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (${classOf[ArrayData].getName}) $ref.nullSafeEval($c);")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = arr.numElements()
    val ids = new Array[Long](k)
    val ns = new Array[Long](k)
    var i = 0
    while (i < k) {
      val row = arr.getStruct(i, 2)
      ids(i) = row.getLong(0)
      ns(i) = row.getLong(1)
      i += 1
    }
    val out = new Array[Any](k * (k - 1) / 2)
    var idx = 0
    i = 0
    while (i < k) {
      var j = i + 1
      while (j < k) {
        val r = new GenericInternalRow(4)
        if (ids(i) < ids(j)) {
          r.update(0, ids(i)); r.update(1, ns(i))
          r.update(2, ids(j)); r.update(3, ns(j))
        } else {
          r.update(0, ids(j)); r.update(1, ns(j))
          r.update(2, ids(i)); r.update(3, ns(i))
        }
        out(idx) = r.asInstanceOf[InternalRow]
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PairCombos =
    copy(child = newChild)

  override def prettyName: String = "pair_combos"
}

/** Single-pass text normalization for near-exact dedup keys:
  * lowercase, drop every char outside `[a-z0-9 ]`, collapse space
  * runs, trim — exactly the chain
  * `trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9 ]+", ""), " +", " "))`
  * but in one scan of the string instead of three full-string passes
  * (two of them java.util.regex). Equivalence argument: removing all
  * chars outside the class is position-independent, so a char filter
  * equals the first regex; dropped chars between spaces merge those
  * spaces, which the pending-space flush reproduces (a space is
  * emitted only when an alnum char follows and output is non-empty,
  * which also yields trim's no-leading/no-trailing guarantee).
  * Lowercasing goes through UTF8String.toLowerCase — the same call
  * Spark's `lower()` makes — before the char walk. ~6× cheaper per
  * byte than the regex chain; at corpus scale the normalization pass
  * dominates q235, so this is the difference between one cheap scan
  * and three expensive ones over 100 TB of text.
  */
case class NormalizeText(child: Expression, punctToSpace: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normTextExpr", this, classOf[NormalizeText].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (${classOf[UTF8String].getName}) $ref.nullSafeEval($c);")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false
        out.append(c)
      } else if (punctToSpace || c == ' ') {
        // punctToSpace: every non-alnum run becomes ONE space
        // (`[^a-z0-9]+` -> ' '); default: only space chars separate,
        // other chars are dropped and adjacent spaces merge through
        // pendingSpace exactly as the remove-then-collapse chain does
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromString(out.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)

  override def prettyName: String = "normalize_text"
}

object TextExprs {
  /** Register SQL-callable functions; idempotent per session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingles",
      exprs => Shingles(exprs.head, 3),
      "builtin")
  }

  import org.apache.spark.sql.graftshim

  /** Column API: distinct n-word shingles of a split-words array. */
  def shingles(words: Column, n: Int = 3): Column =
    graftshim.toColumn(Shingles(graftshim.toExpression(words), n))

  /** Column API: all n-word shingles, multiplicity kept. */
  def ngrams(words: Column, n: Int): Column =
    graftshim.toColumn(NGrams(graftshim.toExpression(words), n))

  /** Column API: unordered pairs of a `(doc_id, n)` posting list. */
  def pairCombos(postings: Column): Column =
    graftshim.toColumn(PairCombos(graftshim.toExpression(postings)))

  /** Column API: single-pass lowercase/strip/collapse/trim normalize.
    * `punctToSpace = true` maps every non-alnum run to one space
    * (`trim(regexp_replace(lower(s), "[^a-z0-9]+", " "))`); the
    * default drops non-space punctuation
    * (`trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9 ]+", ""), " +", " "))`).
    */
  def normalizeText(text: Column, punctToSpace: Boolean = false): Column =
    graftshim.toColumn(NormalizeText(graftshim.toExpression(text), punctToSpace))
}
