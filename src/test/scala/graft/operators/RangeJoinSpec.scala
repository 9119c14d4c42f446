package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val points = Seq(
    // key, ts, id
    ("k1", 100L, 1L),
    ("k1", 1000L, 2L),   // inside the wide interval only
    ("k1", 5000L, 3L),   // outside every k1 interval -> drops
    ("k1", 200L, 4L),    // exactly on an interval end: inclusive
    ("k2", 100L, 5L),    // k2 has no interval -> drops
    ("k3", 7L, 6L)       // degenerate [7,7] interval: still matches
  ).toDF("k", "ts", "id")

  private lazy val intervals = Seq(
    // key, start, end, ivid
    ("k1", 90L, 200L, 100L),   // narrow: catches ids 1 and 4
    ("k1", 0L, 4000L, 101L),   // wide, spans many buckets: ids 1, 2, 4
    ("k3", 7L, 7L, 102L),      // single-point interval
    ("k3", 9L, 3L, 103L)       // end < start: must NOT explode downward
  ).toDF("k", "s", "e", "ivid")

  test("range join: inclusive bounds, multi-bucket spans, degenerate and inverted intervals") {
    // bucketWidth 64 forces the wide interval across ~63 buckets and
    // puts points and interval starts in different buckets
    val out = RangeJoin.rangeJoin(points, intervals, keys = Seq("k"),
        tsCol = "ts", startCol = "s", endCol = "e", bucketWidth = 64L)
      .select("id", "ivid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set(
      (1L, 100L), (1L, 101L),
      (2L, 101L),
      (4L, 100L), (4L, 101L),
      (6L, 102L)))
  }

  test("range join matches the brute-force BETWEEN join on random data") {
    val rnd = new scala.util.Random(7)
    val ps = (0 until 400).map(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(10000).toLong, i.toLong))
    val ivs = (0 until 60).map { i =>
      val s = rnd.nextInt(10000).toLong
      (s"k${rnd.nextInt(5)}", s, s + rnd.nextInt(3000).toLong, i.toLong)
    }
    val pdf = ps.toDF("k", "ts", "id")
    val idf = ivs.toDF("k", "s", "e", "ivid")
    for (width <- Seq(1L, 77L, 1024L, 100000L)) {
      val got = RangeJoin.rangeJoin(pdf, idf, Seq("k"), "ts", "s", "e", width)
        .select("id", "ivid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (pk, ts, id) <- ps
        (ik, s, e, ivid) <- ivs
        if pk == ik && ts >= s && ts <= e
      } yield (id, ivid)).toSet
      assert(got === want, s"width=$width")
      // each matching pair appears exactly once (no distinct needed)
      assert(RangeJoin.rangeJoin(pdf, idf, Seq("k"), "ts", "s", "e", width)
        .count() === want.size.toLong, s"width=$width multiplicity")
    }
  }
}
