package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Int8MilliSpec extends SparkSpec {

  // the two-lambda HOF chain int8_milli replaces, verbatim from the
  // pre-r17 int8Distortion/int8Recall call sites
  private val hofMabs =
    "aggregate(qarr, CAST(0 AS BIGINT), (acc, x) -> greatest(acc, abs(x)))"
  private val hofQ8 =
    "transform(qarr, x -> CASE WHEN mabs = 0 THEN CAST(0 AS BIGINT) " +
      "ELSE CAST(FLOOR(x * 127.0 / mabs + 0.5) AS BIGINT) END)"

  test("int8_milli is bit-identical to the HOF chain on real testdata") {
    val qv = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("vec_id", "quantize_milli(embedding) AS qarr")
    val diff = qv
      .withColumn("native", expr("int8_milli(qarr)"))
      .withColumn("mabs", expr(hofMabs))
      .withColumn("hof", expr(hofQ8))
      .filter(expr("native IS DISTINCT FROM hof"))
      .count()
    assert(diff === 0L)
  }

  test("int8_milli matches the HOF on zero vectors, nulls, and negatives") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        | (1L, array(CAST(1000 AS BIGINT), -500L, 3L, 0L)),
        | (2L, array(CAST(0 AS BIGINT), 0L)),
        | (3L, array(CAST(NULL AS BIGINT), 254L, -127L)),
        | (4L, array(CAST(NULL AS BIGINT), CAST(NULL AS BIGINT))),
        | (5L, array(CAST(-1 AS BIGINT)))
        | AS t(vec_id, qarr)""".stripMargin)
      .withColumn("native", expr("int8_milli(qarr)"))
      .withColumn("mabs", expr(hofMabs))
      .withColumn("hof", expr(hofQ8))
    assert(df.filter(expr("native IS DISTINCT FROM hof")).count() === 0L)
    val rows = df.orderBy("vec_id").collect()
    def nat(r: org.apache.spark.sql.Row): Seq[Any] =
      r.getSeq[Any](r.fieldIndex("native"))
    // scale: floor(x * 127 / mabs + 0.5)
    assert(nat(rows(0)) === Seq(127L, -63L, 0L, 0L))
    // mabs == 0 zero-fills, matching the CASE WHEN mabs = 0 branch
    assert(nat(rows(1)) === Seq(0L, 0L))
    // all-null vector has mabs 0 -> zero-fill (the HOF's branch order)
    assert(nat(rows(3)) === Seq(0L, 0L))
    // null element stays null when mabs != 0
    assert(nat(rows(2)).head === null)
    assert(nat(rows(2))(1) === 127L)
    // negative-only vector: mabs from abs()
    assert(nat(rows(4)) === Seq(-127L))
  }

  test("int8_milli is registered via GraftExtensions and codegens") {
    val df = spark.range(1, 101)
      .selectExpr("array(id, -id * 2, 5L) AS qarr")
      .selectExpr("int8_milli(qarr) AS q8")
      .selectExpr("sum(q8[0] + q8[1] + q8[2]) AS s")
    val expected = (1 until 101).map { i =>
      val mabs = Seq(i.toLong.abs, (i * 2L).abs, 5L).max.toDouble
      math.floor(i * 127.0 / mabs + 0.5).toLong +
        math.floor(-i * 2.0 * 127.0 / mabs + 0.5).toLong +
        math.floor(5 * 127.0 / mabs + 0.5).toLong
    }.sum
    assert(df.collect()(0).getLong(0) === expected)
  }
}
