package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordNGramsSpec extends SparkSpec {

  import spark.implicits._

  test("word_ngrams matches the built-in HOF composition") {
    val df = Seq(
      "the quick brown fox jumps",
      "a b a b a b", // duplicate grams collapse
      "one two",     // shorter than n -> empty
      "x  y z"       // consecutive spaces keep the empty token, like split
    ).toDF("text")
      .withColumn("native", call_function("word_ngrams", col("text"), lit(3)))
      .withColumn("hof", expr(
        "CASE WHEN size(split(text, ' ')) >= 3 THEN " +
          "array_distinct(transform(sequence(1, size(split(text, ' ')) - 2), " +
          "i -> concat_ws(' ', slice(split(text, ' '), i, 3)))) " +
          "ELSE array() END"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](1).sorted === r.getSeq[String](2).sorted,
        r.getString(0))
    }
    val first = df.collect()(0).getSeq[String](1)
    assert(first === Seq("the quick brown", "quick brown fox", "brown fox jumps"))
  }

  test("word_ngrams handles null text and empty string") {
    val df = Seq(Some("a b c"), None, Some("")).toDF("text")
      .withColumn("g", call_function("word_ngrams", col("text"), lit(3)))
    val rows = df.collect()
    assert(rows(0).getSeq[String](1) === Seq("a b c"))
    assert(rows(1).isNullAt(1))
    assert(rows(2).getSeq[String](1) === Seq.empty)
  }

  test("word_ngrams_all keeps every occurrence in position order") {
    val df = Seq(
      ("a b a b a b", 5), // repeats preserved
      ("one two", 1),
      ("one", 0)
    ).toDF("text", "expected_n")
      .withColumn("g", call_function("word_ngrams_all", col("text"), lit(2)))
    val rows = df.collect()
    assert(rows(0).getSeq[String](2) ===
      Seq("a b", "b a", "a b", "b a", "a b"))
    assert(rows(1).getSeq[String](2) === Seq("one two"))
    assert(rows(2).getSeq[String](2) === Seq.empty)
  }

  test("word_ngrams participates in whole-stage codegen") {
    val df = spark.range(50)
      .selectExpr("concat('w', id, ' x y z') AS text")
      .selectExpr("sum(size(word_ngrams(text, 2))) AS s")
    assert(df.collect()(0).getLong(0) === 50L * 3)
    assert("\\*\\(\\d+\\)".r.findFirstIn(df.queryExecution.executedPlan.toString).isDefined,
      df.queryExecution.executedPlan.toString)
  }
}
