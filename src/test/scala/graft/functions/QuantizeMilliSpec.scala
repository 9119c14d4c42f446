package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeMilliSpec extends SparkSpec {

  import spark.implicits._

  private val hof =
    "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"

  test("quantize_milli is bit-identical to the HOF spelling on real testdata") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val diff = emb
      .withColumn("native", expr("quantize_milli(embedding)"))
      .withColumn("hof", expr(hof))
      .filter(expr("native IS DISTINCT FROM hof"))
      .count()
    assert(diff === 0L)
  }

  test("quantize_milli handles negatives, exact halves, floats, and null elements") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        | (1L, array(CAST(1.0015 AS FLOAT), CAST(-0.5 AS FLOAT),
        |            CAST(0.0005 AS FLOAT), CAST(-2.7 AS FLOAT), CAST(0 AS FLOAT))),
        | (2L, array(CAST(NULL AS FLOAT), CAST(3.25 AS FLOAT)))
        | AS t(vec_id, embedding)""".stripMargin)
      .withColumn("native", expr("quantize_milli(embedding)"))
      .withColumn("hof", expr(hof))
    assert(df.filter(expr("native IS DISTINCT FROM hof")).count() === 0L)
    val rows = df.orderBy("vec_id").collect()
    // round-half-up on the double-widened float, floor toward -inf
    val native0 = rows(0).getSeq[Any](rows(0).fieldIndex("native"))
    assert(native0.head === math.floor(1.0015f.toDouble * 1000 + 0.5).toLong)
    assert(native0(3) === math.floor(-2.7f.toDouble * 1000 + 0.5).toLong)
    // null element stays null through the native path
    assert(rows(1).getSeq[Any](rows(1).fieldIndex("native")).head === null)
  }

  test("quantize_milli is registered via GraftExtensions and codegens") {
    val df = spark.range(100)
      .selectExpr("array(CAST(id AS DOUBLE) / 7, -0.0015) AS embedding")
      .selectExpr("quantize_milli(embedding) AS q")
      .selectExpr("sum(q[0] + q[1]) AS s")
    val expected = (0 until 100)
      .map(i => math.floor(i.toDouble / 7 * 1000 + 0.5).toLong +
        math.floor(-0.0015 * 1000 + 0.5).toLong).sum
    assert(df.collect()(0).getLong(0) === expected)
  }
}
