package graft.streaming

import graft.SparkSpec
import graft.events.EventLogFixture
import org.apache.spark.sql.functions._

class StreamingIngestSpec extends SparkSpec {

  test("streaming ingest materialises the canonical frame incrementally") {
    val logs = tmpDir("stream-logs")
    val out = tmpDir("stream-out")
    val ckpt = tmpDir("stream-ckpt")
    EventLogFixture.writeLogs(logs, Seq("app-s1", "app-s2"))

    val canon = StreamingIngest.readStream(spark, s"file://$logs")
    assert(canon.isStreaming)
    val q = StreamingIngest.sinkToStore(canon, out, ckpt)
    q.awaitTermination(60000)

    val stored = spark.read.parquet(out)
    assert(stored.count() === 24)
    assert(stored.select("app_id").distinct().count() === 2)

    // second batch: a new log lands, AvailableNow picks up only it
    EventLogFixture.writeLogs(logs, Seq("app-s3"))
    val q2 = StreamingIngest.sinkToStore(
      StreamingIngest.readStream(spark, s"file://$logs"), out, ckpt)
    q2.awaitTermination(60000)
    assert(spark.read.parquet(out).count() === 36)
  }

  test("watermarked live aggregate plans with bounded state") {
    val logs = tmpDir("stream-agg")
    EventLogFixture.writeLogs(logs, Seq("app-w1"))
    val agg = StreamingIngest.liveAppDayCounts(
      StreamingIngest.readStream(spark, s"file://$logs"))
    assert(agg.isStreaming)
    assert(agg.columns.toSeq ===
      Seq("date", "app_id", "event_count", "total_duration_ms"))
  }
}
