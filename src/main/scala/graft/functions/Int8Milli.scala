package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native Catalyst expression: symmetric per-vector int8 quantization
 * of a milli-quantized vector — the `q8_i = FLOOR(q_i * 127 / max|q|
 * + 0.5)` formula the int8 serving-audit operators
 * ([[graft.pipeline.Embeddings.int8Distortion]], `int8Recall`) apply.
 *
 * Why a native expression: the HOF spelling it replaces ran TWO
 * interpreted lambdas per corpus row — an `aggregate(qarr, 0,
 * (acc, x) -> greatest(acc, abs(x)))` max-abs fold plus a
 * `transform(qarr, x -> ...)` scale pass, each one dispatch + boxed
 * element per dimension ([[QuantizeMilli]]'s rationale, one operator
 * family over). `doGenCode` emits both passes as one fused
 * whole-stage-codegen loop over the primitive array.
 *
 * Bit-compatibility contract (Int8MilliSpec asserts per-row parity
 * with the HOF spelling on real testdata): the max-abs fold seeds at
 * 0 and skips null elements exactly like `greatest` (null-safe max);
 * when the fold yields 0 every output element is 0 — INCLUDING null
 * inputs, because the HOF's `CASE WHEN mabs = 0 THEN 0` branch never
 * looks at the element — otherwise null elements stay null and the
 * scale arithmetic is IEEE double in the SQL cast order
 * (`(double) x * 127.0 / (double) mabs`), floored and cast
 * toward-zero like Spark's non-ANSI double→long.
 */
case class Int8Milli(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int8_milli expects array<bigint>, got " + other.catalogString)
  }

  override def dataType: DataType = child.dataType match {
    case ArrayType(_, containsNull) => ArrayType(LongType, containsNull)
    case _ => ArrayType(LongType, containsNull = true)
  }

  override def prettyName: String = "int8_milli"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var mabs = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val a = Math.abs(arr.getLong(i))
        if (a > mabs) mabs = a
      }
      i += 1
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      if (mabs == 0L) out(i) = 0L
      else if (!arr.isNullAt(i)) {
        out(i) = Math.floor(
          arr.getLong(i).toDouble * 127.0 / mabs.toDouble + 0.5).toLong
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
      val k = ctx.freshName("k")
      val a = ctx.freshName("a")
      val mabs = ctx.freshName("mabs")
      val vals = ctx.freshName("vals")
      val nulls = ctx.freshName("nulls")
      val hasNull = ctx.freshName("hasNull")
      val boxed = ctx.freshName("boxed")
      // Fused max-abs fold + scale pass; the no-null fast path packs a
      // primitive long[] directly ([[QuantizeMilli]]'s shape). A
      // mabs==0 vector zero-fills even its null slots — the HOF's
      // CASE order, preserved bit for bit.
      s"""
         |int $n = $x.numElements();
         |long $mabs = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i)) {
         |    long $a = java.lang.Math.abs($x.getLong($i));
         |    if ($a > $mabs) $mabs = $a;
         |  }
         |}
         |long[] $vals = new long[$n];
         |boolean[] $nulls = new boolean[$n];
         |boolean $hasNull = false;
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($mabs == 0L) {
         |    $vals[$j] = 0L;
         |  } else if ($x.isNullAt($j)) {
         |    $nulls[$j] = true;
         |    $hasNull = true;
         |  } else {
         |    $vals[$j] = (long) java.lang.Math.floor(
         |      (double) $x.getLong($j) * 127.0 / (double) $mabs + 0.5);
         |  }
         |}
         |if (!$hasNull) {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($vals);
         |} else {
         |  Object[] $boxed = new Object[$n];
         |  for (int $k = 0; $k < $n; $k++) {
         |    if (!$nulls[$k]) $boxed[$k] = java.lang.Long.valueOf($vals[$k]);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($boxed);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8Milli =
    copy(child = newChild)
}
