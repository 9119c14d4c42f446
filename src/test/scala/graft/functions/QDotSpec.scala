package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QDotSpec extends SparkSpec {

  import spark.implicits._

  test("qdot matches the built-in HOF composition (codegen vs interpreted)") {
    val df = Seq(
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
      (Array(-3L, 7L), Array(2L, -2L)),
      (Array.empty[Long], Array(1L, 2L))
    ).toDF("a", "b")
      .withColumn("native", expr("qdot(a, b)"))
      .withColumn("hof",
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"))
    val rows = df.collect()
    assert(rows.map(_.getAs[Long]("native")).toSeq === Seq(32L, -20L, 0L))
    // HOF zip_with pads with null -> aggregate yields null for the
    // length-mismatched rows; qdot defines the common-prefix product.
    assert(rows(0).getAs[Long]("hof") === 32L)
  }

  test("qdot is registered as a SQL function via GraftExtensions") {
    val out = spark.sql("SELECT qdot(array(2L, 3L), array(10L, 100L)) AS d").collect()
    assert(out(0).getLong(0) === 320L)
  }

  test("qdot participates in whole-stage codegen") {
    val df = spark.range(100)
      .selectExpr("array(id, id + 1) AS a", "array(2L, 3L) AS b")
      .selectExpr("sum(qdot(a, b)) AS s")
    assert(df.collect()(0).getLong(0) === (0 until 100).map(i => 2L * i + 3L * (i + 1)).sum)
    // after execution AQE has finalised the plan; codegen stages show as *(n)
    assert("\\*\\(\\d+\\)".r.findFirstIn(df.queryExecution.executedPlan.toString).isDefined,
      df.queryExecution.executedPlan.toString)
  }
}
