package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: DISTINCT word n-grams of a
 * space-tokenized string — `word_ngrams(text, n)` returns
 * `array<string>` of every n consecutive tokens joined by one space,
 * first-occurrence order, duplicates removed. Empty array when the
 * text has fewer than n tokens; null text gives null.
 *
 * Why a native expression: shingling is the hot inner loop of every
 * near-dup operator (minhash, simhash, n-gram Jaccard, novelty), and
 * the built-in composition
 * `array_distinct(transform(sequence(...), i -> concat_ws(' ',
 * slice(split(text, ' '), i, n))))` evaluates the lambda INTERPRETED —
 * per-gram closure dispatch plus a sliced intermediate array per gram
 * per row. This expression tokenizes once and builds each gram with a
 * reused buffer inside one JIT-compiled method, staying inside
 * whole-stage codegen.
 *
 * Tokenization matches `split(text, ' ')` / DuckDB `string_split(text,
 * ' ')` exactly: single-space separator, empty tokens preserved — the
 * oracle CTE mirrors this.
 */
case class WordNGrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"word_ngrams expects (string, int literal), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(s: Any, n: Any): Any =
    WordNGrams.compute(s.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) =>
      s"${ev.value} = graft.functions.WordNGrams.compute($s, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNGrams =
    copy(left = newLeft, right = newRight)
}

/**
 * Multiplicity-preserving sibling of [[WordNGrams]]:
 * `word_ngrams_all(text, n)` keeps every occurrence in position order
 * (no dedup) — the shape n-gram STATISTICS need (collocation counts,
 * language-model frequencies), where dropping repeats would bias every
 * count. Same tokenization contract, same codegen structure.
 */
case class WordNGramsAll(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"word_ngrams_all expects (string, int literal), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_ngrams_all"

  override def nullSafeEval(s: Any, n: Any): Any =
    WordNGrams.computeAll(s.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) =>
      s"${ev.value} = graft.functions.WordNGrams.computeAll($s, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNGramsAll =
    copy(left = newLeft, right = newRight)
}

object WordNGrams {
  /** Shared by interpreted eval and codegen (static-invoke pattern):
   *  one tokenize, one reused gram buffer, LinkedHashSet dedup. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    if (toks.length < n || n <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String]()
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val arr = new Array[Any](seen.size())
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(arr)
    }
  }

  /** [[WordNGramsAll]]'s kernel: every occurrence, position order. */
  def computeAll(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    if (toks.length < n || n <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val arr = new Array[Any](toks.length - n + 1)
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        arr(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(arr)
    }
  }
}
