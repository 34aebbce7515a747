package graft.ops

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Overlap INDEPENDENT Spark actions from driver threads (guide §2.6):
  * Spark's scheduler runs concurrent jobs fine — actions are only
  * sequential because driver code calls them sequentially. The
  * multi-action contract queries (profile even half / odd half / HLL
  * sketches / exact duals) each submit a chain of small jobs whose
  * tasks leave most cores idle; overlapping them back-fills the
  * cluster. Results are whatever each thunk computes — determinism is
  * untouched, only WHEN the jobs run changes.
  *
  * Bounded daemon pool: a driver thread per in-flight job chain, NOT
  * per task; 8 chains in flight is plenty to fill a tail (guide:
  * "2-3 jobs in flight is plenty" — we allow a few more because these
  * chains are single-task jobs at bench scale). */
object Jobs {
  private lazy val pool = ExecutionContext.fromExecutorService(
    java.util.concurrent.Executors.newFixedThreadPool(8,
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-jobs-${n.incrementAndGet()}")
          t.setDaemon(true); t
        }
      }))

  def fork[T](body: => T): Future[T] = Future(body)(pool)

  def join[T](f: Future[T]): T = Await.result(f, Duration.Inf)
}
