package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property-style checks over the numeric kernels and pair generation
  * (raw ScalaCheck generators sampled with fixed seeds — the
  * scalatest bridge artifact is not on the offline classpath). */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val smallLong = Gen.chooseNum(-1000000L, 1000000L)
  private val vecGen = Gen.listOfN(8, smallLong)

  test("qdot equals the BigInt reference on random vectors") {
    for (seed <- 1L to 5L) {
      val pairs = sample(Gen.listOfN(20, Gen.zip(vecGen, vecGen)), seed)
      val df = pairs.map { case (a, b) => (a.toArray, b.toArray) }
        .toDF("a", "b").withColumn("d", expr("qdot(a, b)"))
      val got = df.collect().map(_.getAs[Long]("d")).toSeq
      val want = pairs.map { case (a, b) =>
        a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum.toLong
      }
      assert(got === want, s"seed=$seed")
    }
  }

  test("salted bucket pairs equal plain pairs for random bucket shapes") {
    for (seed <- 1L to 5L) {
      val members = sample(Gen.listOfN(40,
        Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 30L))), seed).distinct
      val salts = (seed % 5 + 1).toInt
      val df = members.toDF("bucket", "doc_id")
      val salted = graft.pipeline.Dedup
        .saltedBucketPairs(df, Seq("bucket"), "doc_id", salts)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val plain = members.groupBy(_._1).values.flatMap { grp =>
        val ids = grp.map(_._2).distinct
        for (a <- ids; b <- ids if a < b) yield (a, b)
      }.toSet
      assert(salted === plain, s"seed=$seed salts=$salts")
    }
  }

  test("canonical mapping is deterministic across physical layouts") {
    val c1 = graft.events.TestDataAdapter
      .canonical(spark, "/root/testdata/sf0.001")
      .agg(sum(expr("hash(app_id, event_type, event_time_us, duration_ms)")))
      .collect()(0).getLong(0)
    val c2 = graft.events.TestDataAdapter
      .canonical(spark, "/root/testdata/sf0.001")
      .repartition(13) // different layout, same result
      .agg(sum(expr("hash(app_id, event_type, event_time_us, duration_ms)")))
      .collect()(0).getLong(0)
    assert(c1 === c2)
  }
}
