package graft.sources

/**
 * Failure isolation for external storage endpoints — the reference's
 * circuit-breaker protection on HDFS/S3 reads (reference:
 * src/circuit_breaker.rs:51-253, advertised README.md:24), re-expressed
 * as a small synchronized state machine the DRIVER-side listing/scan
 * calls wrap. Executor-side read failures are already isolated by
 * Spark's own task retry/blacklisting; what Spark does NOT protect is
 * the driver's serial metadata loop — a flaky namenode/S3 endpoint
 * turns every scheduled scan into a hanging timeout, and THAT is what
 * fails fast here.
 *
 * States and transitions (classic three-state breaker):
 *  - CLOSED: calls pass through; `failureThreshold` failures inside a
 *    rolling `windowMs` window opens the circuit (a success resets the
 *    count — only an unbroken run of recent failures trips it).
 *  - OPEN: calls fail IMMEDIATELY with [[CircuitOpenException]]
 *    (nothing touches the endpoint) until `timeoutMs` has passed since
 *    the last failure, then the next call probes as HALF-OPEN.
 *  - HALF-OPEN: calls pass through; `successThreshold` consecutive
 *    successes close the circuit, any failure re-opens it and restarts
 *    the timeout. (The reference leaves a half-open failure in
 *    half-open — src/circuit_breaker.rs:165-191 only transitions
 *    Closed->Open — which lets a still-down endpoint be hammered by
 *    every call; re-opening is the standard behavior and strictly
 *    safer, so this implementation re-opens.)
 *
 * The clock is injectable so specs drive the OPEN -> HALF-OPEN timeout
 * without sleeping.
 */
class CircuitBreaker(val name: String,
                     failureThreshold: Int = 5,
                     successThreshold: Int = 3,
                     timeoutMs: Long = 60000L,
                     windowMs: Long = 300000L,
                     clock: () => Long = () => System.currentTimeMillis()) {

  import CircuitBreaker._

  private var st: State = Closed
  private var failures = 0
  private var successes = 0
  private var lastFailureAt = 0L
  private var windowStart = clock()

  /** Current state, for monitoring/specs: "closed" | "open" | "half-open". */
  def state: String = synchronized {
    st match {
      case Closed => "closed"
      case Open => "open"
      case HalfOpen => "half-open"
    }
  }

  def failureCount: Int = synchronized(failures)

  /** Run `body` under the breaker: fail fast when OPEN, otherwise
   *  execute and record the outcome. The original exception is
   *  rethrown on failure — callers keep their error handling. */
  def call[T](body: => T): T = {
    beforeCall()
    val result =
      try body
      catch {
        case e: Throwable =>
          recordFailure()
          throw e
      }
    recordSuccess()
    result
  }

  private def beforeCall(): Unit = synchronized {
    st match {
      case Open =>
        if (clock() - lastFailureAt > timeoutMs) {
          st = HalfOpen
          successes = 0
        } else throw new CircuitOpenException(name)
      case _ => ()
    }
  }

  private def recordSuccess(): Unit = synchronized {
    st match {
      case HalfOpen =>
        successes += 1
        if (successes >= successThreshold) {
          st = Closed
          failures = 0
          successes = 0
        }
      case Closed => failures = 0
      case Open => () // late success from a call admitted pre-open
    }
  }

  private def recordFailure(): Unit = synchronized {
    val now = clock()
    if (now - windowStart > windowMs) {
      failures = 0
      windowStart = now
    }
    failures += 1
    lastFailureAt = now
    st match {
      case Closed if failures >= failureThreshold => st = Open
      case HalfOpen => st = Open // probe failed: endpoint still down
      case _ => ()
    }
  }
}

object CircuitBreaker {
  private sealed trait State
  private case object Closed extends State
  private case object Open extends State
  private case object HalfOpen extends State
}

/** Fail-fast signal: the protected endpoint is known-down and the
 *  call was rejected WITHOUT touching it. Callers treat it like any
 *  other transient storage failure (skip the scan round, retry on
 *  the next schedule). */
class CircuitOpenException(name: String)
  extends java.io.IOException(
    s"circuit breaker '$name' is open — storage endpoint failing fast")
