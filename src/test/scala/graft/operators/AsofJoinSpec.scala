package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val left = Seq(
    // key, time, id
    ("k1", 100L, 1L),
    ("k1", 200L, 2L),
    ("k1", 50L, 3L),  // before any right row -> null payload
    ("k2", 100L, 4L)
  ).toDF("k", "t", "id")

  private lazy val right = Seq(
    // key, time, id, payload
    ("k1", 80L, 10L, "v80"),
    ("k1", 100L, 11L, "v100"),   // equal time: inclusive, must match id=1
    ("k1", 100L, 12L, "v100b"),  // tie on (key, time): greatest id wins
    ("k1", 150L, 13L, "v150"),
    ("k3", 10L, 14L, "vOther")   // different key: never matches
  ).toDF("k", "t", "id", "p")

  test("asof join: inclusive boundary, latest-wins, ties, and left nulls") {
    val out = AsofJoin.asofJoin(left, right, keys = Seq("k"), timeCol = "t",
      payload = Seq("p"), tieBreak = "id")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("p")).toMap
    assert(out(1L) === "v100b") // equal-time inclusive + max-tieBreak among ties
    assert(out(2L) === "v150")  // latest version <= 200
    assert(out(3L) === null)    // no right row at or before 50
    assert(out(4L) === null)    // k2 has no right rows at all
  }

  test("asof join plan contains no join operator — one exchange, one sort") {
    val df = AsofJoin.asofJoin(left, right, keys = Seq("k"), timeCol = "t",
      payload = Seq("p"), tieBreak = "id")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
