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

  test("flatMapGroupsWithState tracks app lifecycle across batches") {
    val logs = tmpDir("state-logs")
    val ckpt = tmpDir("state-ckpt")
    EventLogFixture.writeLogs(logs, Seq("app-st1", "app-st2"))

    def runBatch(): Map[String, graft.streaming.AppLifecycle] = {
      val updates = scala.collection.mutable.Map[String, graft.streaming.AppLifecycle]()
      val q = AppStateTracker.track(StreamingIngest.readStream(spark, s"file://$logs"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.AppLifecycle], _: Long) =>
          batch.collect().foreach(a => updates(a.app_id) = a)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      updates.toMap
    }

    val first = runBatch()
    assert(first.keySet === Set("app-st1", "app-st2"))
    assert(first("app-st1").completed)
    assert(first("app-st1").n_events === 12L)
    assert(first("app-st1").n_tasks === 2L)
    assert(first("app-st1").started_at_us === 1700000000000000L)

    // a new app lands; state for it accumulates from its own events only
    EventLogFixture.writeLogs(logs, Seq("app-st3"))
    val second = runBatch()
    assert(second.keySet === Set("app-st3"))
    assert(second("app-st3").n_events === 12L)
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
