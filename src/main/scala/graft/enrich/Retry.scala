package graft.enrich



/** Pure retry/backoff/bisect utilities matching the reference's network
  * error handling, with an injectable sleeper so tests run instantly. */
object Retry {

  /** Thrown by clients on HTTP 429. */
  final case class RateLimited(message: String = "429") extends RuntimeException(message)

  /** Thrown by clients on HTTP 400 for a batch containing a bad element. */
  final case class BadBatch(message: String = "400") extends RuntimeException(message)

  /** E3 — 429 backoff: wait 30 s and retry the same request, unbounded
    * (reference: src/lib/commands/roblox.ts:26-39). `maxRetries` defaults
    * high rather than truly unbounded so a wedged endpoint can't hang an
    * executor forever. */
  def withRateLimitRetry[T](
      maxRetries: Int = 1000,
      backoffMs: Long = graft.model.Constants.RateLimitBackoffMs,
      sleep: Long => Unit = Thread.sleep)(f: () => T): T = {
    var remaining = maxRetries
    while (true) {
      try return f()
      catch {
        case RateLimited(_) if remaining > 0 =>
          remaining -= 1
          sleep(backoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** E4 — 400 bisect: split the failing batch in half recursively; a
    * failing singleton falls back to a per-item call (reference:
    * src/lib/commands/gatherGamesRolimons.ts:120-158). Preserves input
    * order, drops items whose singleton fallback also fails. */
  def withBisect[A, B](
      batch: Seq[A],
      call: Seq[A] => Seq[B],
      fallback: A => Option[B]): Seq[B] =
    try call(batch)
    catch {
      case BadBatch(_) =>
        if (batch.sizeIs <= 1) batch.flatMap(fallback(_).toSeq)
        else {
          val (l, r) = batch.splitAt(batch.size / 2)
          withBisect(l, call, fallback) ++ withBisect(r, call, fallback)
        }
    }
}
