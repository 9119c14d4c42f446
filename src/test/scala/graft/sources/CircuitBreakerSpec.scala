package graft.sources

import java.net.URI
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import graft.events.EventLogFixture
import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** Hadoop FileSystem for the `flaky://` scheme: a local FS whose
  * `listStatus` throws for the first [[FlakyFs.failuresLeft]] calls —
  * the "injected flaky endpoint" the breaker spec drives ingest
  * against. Registered via `fs.flaky.impl` (the standard Hadoop
  * custom-scheme hook), so the PRODUCTION listing path is exercised
  * unchanged. */
class FlakyFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("flaky:///")
  override def listStatus(p: Path): Array[FileStatus] = {
    if (FlakyFs.failuresLeft.getAndUpdate(n => math.max(n - 1, 0)) > 0)
      throw new java.io.IOException("flaky endpoint: listStatus refused")
    super.listStatus(p)
  }
}

object FlakyFs {
  val failuresLeft = new AtomicInteger(0)
}

class CircuitBreakerSpec extends SparkSpec {

  test("state machine: closed -> open -> half-open -> closed, with re-open on failed probe") {
    var now = 0L
    val b = new CircuitBreaker("t", failureThreshold = 3,
      successThreshold = 2, timeoutMs = 1000L, windowMs = 60000L,
      clock = () => now)
    def boom(): Unit =
      intercept[RuntimeException](b.call(throw new RuntimeException("io")))
    assert(b.state === "closed")
    boom(); boom()
    // a success inside CLOSED resets the failure run
    b.call(42)
    assert(b.failureCount === 0)
    boom(); boom(); boom()
    assert(b.state === "open")
    // OPEN fails fast without executing the body
    var executed = false
    intercept[CircuitOpenException](b.call { executed = true })
    assert(!executed)
    // after the timeout the next call probes HALF-OPEN; a failed
    // probe re-opens (stricter than the reference, see scaladoc)
    now = 2000L
    boom()
    assert(b.state === "open")
    intercept[CircuitOpenException](b.call(1))
    // probe again later: two successes close it
    now = 4000L
    b.call(1)
    assert(b.state === "half-open")
    b.call(1)
    assert(b.state === "closed")
    b.call(1) // and stays closed
    assert(b.state === "closed")
  }

  test("failure window: stale failures do not accumulate toward the threshold") {
    var now = 0L
    val b = new CircuitBreaker("w", failureThreshold = 3,
      successThreshold = 1, timeoutMs = 1000L, windowMs = 5000L,
      clock = () => now)
    intercept[RuntimeException](b.call(throw new RuntimeException("a")))
    intercept[RuntimeException](b.call(throw new RuntimeException("b")))
    now = 10000L // window expired: the two old failures age out
    intercept[RuntimeException](b.call(throw new RuntimeException("c")))
    assert(b.state === "closed")
    assert(b.failureCount === 1)
  }

  test("ingest survives a flaky storage endpoint: fails fast while open, recovers, loses nothing") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.flaky.impl", classOf[FlakyFs].getName)
    val d = tmpDir("cb-ingest")
    val ckpt = tmpDir("cb-ckpt") + "/state.tsv"
    EventLogFixture.writeLogs(d, Seq("app-cb"))
    var now = 0L
    val b = new CircuitBreaker("flaky-src", failureThreshold = 2,
      successThreshold = 1, timeoutMs = 1000L, windowMs = 60000L,
      clock = () => now)
    val ing = new IncrementalIngest(spark, ckpt, breaker = Some(b))
    val uri = s"flaky://$d"

    FlakyFs.failuresLeft.set(10)
    // two real failures trip the breaker...
    intercept[java.io.IOException](ing.ingest(uri)(_ => ()))
    intercept[java.io.IOException](ing.ingest(uri)(_ => ()))
    assert(b.state === "open")
    // ...after which scans fail FAST: the endpoint is not touched
    // (failuresLeft does not decrement) and the checkpoint is untouched
    val before = FlakyFs.failuresLeft.get()
    intercept[CircuitOpenException](ing.ingest(uri)(_ => ()))
    assert(FlakyFs.failuresLeft.get() === before)

    // endpoint recovers; the timed-out breaker probes half-open and
    // the SAME ingest call completes with the full delta — nothing
    // was lost across the outage (at-least-once: checkpoint never
    // advanced during failures)
    FlakyFs.failuresLeft.set(0)
    now = 5000L
    var n = 0L
    val touched = ing.ingest(uri)(df => n = df.count())
    assert(touched.nonEmpty)
    assert(n === 12)
    assert(b.state === "closed")
    // and the next scan is a clean no-delta round
    assert(ing.ingest(uri)(_ => fail("no delta expected")).isEmpty)
  }
}
