package graft.api

import graft.SparkSpec
import graft.events.{EventLogFixture, EventLogParser}

class HistoryServerApiSpec extends SparkSpec {

  private lazy val canon = {
    val d = tmpDir("api-logs")
    EventLogFixture.writeLogs(d, Seq("app-api-1", "app-api-2"))
    EventLogParser.read(spark, d).cache()
  }

  test("applications list filters and limits") {
    assert(HistoryServerApi.applications(canon).count() === 2)
    assert(HistoryServerApi.applications(canon, limit = 1).count() === 1)
  }

  test("single application lookup returns the attempt payload") {
    val row = HistoryServerApi.application(canon, "app-api-1").collect()
    assert(row.length === 1)
    assert(row(0).getAs[String]("name") === "nightly-etl")
    assert(row(0).getAs[Long]("completed") === 1L)
  }

  test("executors endpoint returns per-executor summaries") {
    val ex = HistoryServerApi.executors(canon, "app-api-2")
    assert(ex.count() === 2)
  }

  test("jobs and stages endpoints (reference stubs these; graft implements them)") {
    val jobs = HistoryServerApi.jobs(canon, "app-api-1").collect()
    assert(jobs.length === 1)
    assert(jobs(0).getAs[Long]("job_id") === 0L)
    assert(jobs(0).getAs[String]("status") === "SUCCEEDED")
    assert(jobs(0).getAs[Long]("duration_ms") === 3400L) // 5400 - 2000 ms
    val stages = HistoryServerApi.stages(canon, "app-api-1").collect()
    assert(stages.length === 1)
    assert(stages(0).getAs[Long]("num_tasks") === 2L)
    assert(stages(0).getAs[Long]("failed_tasks") === 1L)
    assert(stages(0).getAs[String]("status") === "COMPLETE")
    assert(stages(0).getAs[Long]("input_bytes") === 1048576L + 2097152L)
  }

  test("storage endpoint summarises block-manager registrations") {
    val d = tmpDir("bm-logs")
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "app-bm-1.json"),
      EventLogFixture.extendedLog().mkString("\n").getBytes("UTF-8"))
    val c = EventLogParser.read(spark, d)
    val rows = HistoryServerApi.storage(c, "app-bm-1").collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("executor_id") === "3")
    assert(rows(0).getAs[String]("host") === "worker-c")
    assert(rows(0).getAs[Long]("max_onheap_memory") === 3221225472L)
    assert(rows(0).getAs[Long]("deregistration_events") === 1L)
  }

  test("environment endpoint returns one row per Spark property") {
    val d = tmpDir("env-logs")
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "app-env-1.json"),
      (EventLogFixture.appLog("app-env-1") ++ EventLogFixture.extendedLog())
        .mkString("\n").getBytes("UTF-8"))
    val c = EventLogParser.read(spark, d)
    val env = HistoryServerApi.environment(c, "app-env-1").collect()
    assert(env.map(r => r.getAs[String]("key") -> r.getAs[String]("value")).toMap ===
      Map("spark.version" -> "3.5.7", "spark.master" -> "yarn"))
  }

  test("health endpoint reports store liveness + corpus bounds") {
    val row = HistoryServerApi.health(canon).collect()(0)
    assert(row.getAs[String]("status") === "healthy")
    assert(row.getAs[Long]("total_events") > 0)
    assert(row.getAs[Long]("total_applications") === 2)
    assert(row.getAs[String]("first_event_date") <=
      row.getAs[String]("last_event_date"))
    // an empty (but reachable) store is status=empty, not a crash
    val empty = HistoryServerApi.health(canon.limit(0)).collect()(0)
    assert(empty.getAs[String]("status") === "empty")
    assert(empty.getAs[Long]("total_events") === 0)
  }

  test("version endpoint") {
    assert(HistoryServerApi.version(spark).count() === 1)
  }

  test("sql executions endpoint pairs start/end into a lifecycle row") {
    val d = tmpDir("sql-logs")
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "app-sql-1.json"),
      (EventLogFixture.appLog("app-sql-1") ++ EventLogFixture.extendedLog())
        .mkString("\n").getBytes("UTF-8"))
    val c = EventLogParser.read(spark, d)
    val rows = HistoryServerApi.sqlExecutions(c, "app-sql-1").collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[Long]("sql_execution_id") === 7L)
    assert(rows(0).getAs[Long]("duration_ms") === 100L) // time+300 .. time+400
    assert(rows(0).getAs[String]("status") === "COMPLETED")
  }

  test("analytics routes compose over the same frame") {
    assert(HistoryServerApi.crossAppSummary(canon).count() === 1)
    assert(HistoryServerApi.performanceTrends(canon).count() > 0)
    assert(HistoryServerApi.topResourceConsumers(canon).count() > 0)
  }
}
