package graft.enrich

import scala.annotation.tailrec
import scala.util.{Failure, Success, Try}

/** E2 retry semantics (`/root/reference/main.py:533-604`):
  *   - rate-limit errors ("rate limit"/"429"/"too many requests"):
  *     exponential backoff `2 * 2^r` seconds, up to `retryAttempts`;
  *   - fatal classifications — bad key, quota/billing, unknown model —
  *     fail immediately (main.py:583-596);
  *   - anything else: backoff `1 * 2^r` seconds, up to `retryAttempts`.
  * Error classification is the reference's lower-cased substring test
  * (F9, main.py:571-596).
  */
object RetryPolicy {
  sealed trait ErrorClass
  case object RateLimited extends ErrorClass
  case object Fatal extends ErrorClass
  case object Transient extends ErrorClass

  def classify(e: Throwable): ErrorClass = e match {
    // HTTP responses carry a status code — classify on it FIRST, so
    // arbitrary response-body bytes echoed into the message (the
    // describeFailure fallback keeps a 200-byte snippet) can never flip
    // the class: a 5xx is always retryable even if its body happens to
    // contain "does not exist" or an api-key complaint, and 429 is
    // always rate-limited. Unlisted 4xx statuses fall through to the
    // message taxonomy, which sees describeFailure's CANONICAL wording
    // for the known fatal states (quota/billing/model).
    case h: EnrichHttpException if h.status == 429 => RateLimited
    case h: EnrichHttpException if h.status == 401 || h.status == 403 => Fatal
    case h: EnrichHttpException if h.status >= 500 => Transient
    case _ => classifyMessage(Option(e.getMessage).getOrElse(""))
  }

  /** The reference's lower-cased substring taxonomy (main.py:571-596) —
    * the only signal available for SDK-style string errors. */
  private def classifyMessage(msg: String): ErrorClass = {
    val m = msg.toLowerCase
    if (m.contains("rate limit") || m.contains("429") || m.contains("too many requests"))
      RateLimited
    else if (m.contains("api key") || m.contains("unauthorized") || m.contains("401") ||
             m.contains("quota") || m.contains("billing") ||
             m.contains("model not found") || m.contains("does not exist"))
      Fatal
    else Transient
  }

  def backoffMs(cls: ErrorClass, retry: Int): Long = cls match {
    case RateLimited => (math.pow(2, retry) * 2000).toLong // main.py:576
    case _ => (math.pow(2, retry) * 1000).toLong           // main.py:600
  }

  /** Run `f` with the reference's retry loop. */
  def withRetries[T](attempts: Int, sleepMs: Long => Unit = Thread.sleep)(f: () => T): Try[T] = {
    @tailrec def loop(retry: Int): Try[T] =
      Try(f()) match {
        case s @ Success(_) => s
        case Failure(e) =>
          classify(e) match {
            case Fatal => Failure(e)
            case cls if retry < attempts - 1 =>
              sleepMs(backoffMs(cls, retry)); loop(retry + 1)
            case _ => Failure(e)
          }
      }
    loop(0)
  }
}
