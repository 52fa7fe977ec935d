package graft.util

/** Single-flight lookup over a synchronized LRU memo: concurrent
  * callers of the SAME key wait for the first builder instead of
  * building twice (the RelCache.memo rendezvous, shared by the driver-
  * side training memos — coarse centroids, PQ codebooks, BPE merges).
  * Different keys build fully concurrently; a failed builder's waiters
  * fall through and attempt the build themselves (the failure might be
  * transient; the original caller still sees its own exception).
  *
  * Keys must embed everything that determines the value (session
  * identity, the input plan's semantic hash, every parameter) — the
  * kmeansCentroids key discipline. The in-flight table is shared
  * across all memos, so keys must also be globally distinct (prefix
  * with an operator tag).
  *
  * Every MISS logs its build wall against the key (the capDecisions
  * logging discipline): trained-artifact queries pay training exactly
  * once per key, so round-over-round solo-time comparisons need to
  * know whether a given run carried the build — the log line makes
  * the train-vs-search split readable without forensic re-runs. */
object SingleFlight {
  private val logger = org.slf4j.LoggerFactory.getLogger("graft.util.SingleFlight")
  private val inflight = new java.util.concurrent.ConcurrentHashMap[
    Any, java.util.concurrent.CompletableFuture[AnyRef]]()

  def apply[V <: AnyRef](cache: java.util.LinkedHashMap[Any, V],
      key: Any)(build: => V): V = {
    while (true) {
      val hit = cache.synchronized(cache.get(key))
      if (hit != null) return hit
      val fut = new java.util.concurrent.CompletableFuture[AnyRef]()
      val prior = inflight.putIfAbsent(key, fut)
      if (prior != null) {
        try return prior.join().asInstanceOf[V]
        catch { case _: java.util.concurrent.CompletionException => () }
        // builder failed — loop: re-check the memo, then race to build
      } else {
        try {
          val t0 = System.nanoTime()
          val built = build
          // training-memo keys are hash-based tuples (the kmeansCentroids
          // discipline) so rendering them is safe — but cap it anyway
          logger.warn(f"single-flight build: key=${key.toString.take(200)} " +
            f"took ${(System.nanoTime() - t0) / 1e9}%.3f s")
          cache.synchronized(cache.put(key, built))
          fut.complete(built.asInstanceOf[AnyRef])
          return built
        } catch {
          case e: Throwable => fut.completeExceptionally(e); throw e
        } finally inflight.remove(key, fut)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
