package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/**
 * Native Catalyst expression: milli-unit quantization of a float or
 * double vector — `quantize_milli(v)[i] = floor(double(v[i]) * 1000
 * + 0.5)` as BIGINT, the round-half-up formula every embedding
 * operator quantizes with (see [[graft.util.Round]] for why `ROUND`
 * itself diverges between engines). Null elements stay null.
 *
 * Why a native expression: this is the ENTRY projection of the whole
 * embedding family — every ANN/kNN/dedup query quantizes the corpus
 * (and often twice, corpus + queries) before anything else runs, and
 * the `transform(embedding, x -> CAST(FLOOR(...)))` higher-order
 * composition it replaces evaluates its lambda INTERPRETED, one
 * dispatch + boxed element per dimension per row ([[QDot]]'s
 * rationale at the quantization step instead of the dot product).
 * `doGenCode` emits the per-element loop straight into whole-stage
 * codegen: one primitive long[] fill per row, no lambda frames.
 *
 * Bit-compatibility contract (QuantizeMilliSpec asserts per-row
 * parity with the HOF spelling on real testdata): float elements
 * widen to double exactly like `CAST(x AS DOUBLE)`, the multiply-add
 * is IEEE double arithmetic in the same order, and the final cast is
 * Spark's non-ANSI double→long (Java `(long)` — toward-zero, NaN→0),
 * applied to an already-integral `Math.floor` result.
 */
case class QuantizeMilli(child: Expression) extends UnaryExpression {

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => DoubleType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_milli expects array<float> or array<double>, got " +
        other.catalogString)
  }

  override def dataType: DataType = child.dataType match {
    case ArrayType(_, containsNull) => ArrayType(LongType, containsNull)
    case _ => ArrayType(LongType, containsNull = true)
  }

  override def prettyName: String = "quantize_milli"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    val isFloat = elemType == FloatType
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val d = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        out(i) = Math.floor(d * 1000.0 + 0.5).toLong
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val vals = ctx.freshName("vals")
      val nulls = ctx.freshName("nulls")
      val hasNull = ctx.freshName("hasNull")
      val boxed = ctx.freshName("boxed")
      val getElem =
        if (elemType == FloatType) s"(double) $x.getFloat($i)"
        else s"$x.getDouble($i)"
      // Fast path: no null elements (every real embedding row) packs
      // the primitive long[] directly; the null-bearing fallback boxes
      // into a GenericArrayData so null elements stay null, exactly
      // like the HOF spelling.
      s"""
         |int $n = $x.numElements();
         |long[] $vals = new long[$n];
         |boolean[] $nulls = new boolean[$n];
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) {
         |    $nulls[$i] = true;
         |    $hasNull = true;
         |  } else {
         |    $vals[$i] = (long) java.lang.Math.floor($getElem * 1000.0 + 0.5);
         |  }
         |}
         |if (!$hasNull) {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($vals);
         |} else {
         |  Object[] $boxed = new Object[$n];
         |  for (int $j = 0; $j < $n; $j++) {
         |    if (!$nulls[$j]) $boxed[$j] = java.lang.Long.valueOf($vals[$j]);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($boxed);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeMilli =
    copy(child = newChild)
}
