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

  test("version endpoint") {
    assert(HistoryServerApi.version(spark).count() === 1)
  }

  test("analytics routes compose over the same frame") {
    assert(HistoryServerApi.crossAppSummary(canon).count() === 1)
    assert(HistoryServerApi.performanceTrends(canon).count() > 0)
    assert(HistoryServerApi.topResourceConsumers(canon).count() > 0)
  }
}
