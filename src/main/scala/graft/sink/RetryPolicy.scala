package graft.sink

/** Bounded retry with a degrade ladder — the *spirit* of the reference's
  * NewDowngradingConsistencyRetryPolicy (reference:
  * NewDowngradingConsistencyRetryPolicy.java:70-196: N retries, each at a
  * progressively weaker consistency level, then give up).
  *
  * Two deliberate strengthenings over the reference (SURVEY.md §2.7 R2):
  *  - exhausted retries FAIL the batch (the reference silently dropped
  *    the record in an empty async callback, CassandraOutputFormat.java:
  *    109-119); `lenient = true` restores drop-on-failure bug-compat.
  *  - retries are synchronous within the batch, so Spark's checkpoint
  *    replay boundary stays correct.
  */
final case class RetryPolicy(
    maxRetries: Int = 5,
    ladder: Seq[String] = Seq("QUORUM", "THREE", "TWO", "ONE"),
    lenient: Boolean = false,
    backoffMs: Long = 0L
) {
  require(maxRetries >= 1, "additional retry count must be >= 1") // ctor guard parity (:73-77)

  /** Run `op` with up to `maxRetries` attempts; attempt i is offered the
    * i-th rung of the consistency ladder (sticky at the weakest rung).
    */
  def runWith[T](op: String => T): Option[T] = {
    var attempt = 0
    var out: Option[T] = None
    var last: Throwable = null
    while (out.isEmpty && attempt < maxRetries) {
      val level = ladder(math.min(attempt, ladder.size - 1))
      try out = Some(op(level))
      catch {
        // fatal JVM errors (OOM, interrupts) must propagate, not retry
        case scala.util.control.NonFatal(e) =>
          last = e
          attempt += 1
          if (backoffMs > 0) Thread.sleep(backoffMs * attempt)
      }
    }
    if (out.isEmpty && !lenient) throw last
    out
  }

  def run[T](op: => T): Option[T] = runWith(_ => op)
}

object RetryPolicy {
  /** Reference default: 5 attempts (CassandraOutputFormat.java:93,97). */
  val default: RetryPolicy = RetryPolicy(maxRetries = 5)
}
