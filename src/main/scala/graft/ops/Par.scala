package graft.ops

/** Driver-side helper for overlapping two INDEPENDENT bounded Spark
  * actions (the optimization guide's overlap-independent-jobs pattern,
  * §2.6): both submit immediately, FIFO scheduling backfills the first
  * job's task tail with the second's tasks, and results are assembled
  * deterministically — the scheduler only changes wall-clock. Used for
  * the bounded training/collect pairs (hybrid rank heads, PQ codebook
  * + query fetch, LM unigram + bigram top-ks).
  */
object Par {
  def overlap[A, B](a: => A, b: => B): (A, B) = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val fa = Future(a)
    val fb = Future(b)
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf))
  }
}
