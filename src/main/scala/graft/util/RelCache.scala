package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Bounded derived-relation memo shared by the pipeline operators.
  *
  * Signature / gram-set / bucket relations are pinned and REUSED across
  * operators on the same input (minhashLsh, nearDupPairs and nearDupKeep
  * over one corpus share one signature pass). Keyed by the canonicalized
  * analyzed plan, so cache equality means semantically-identical input +
  * parameters. These relations are exactly the artifacts a production
  * pipeline checkpoints.
  *
  * The memo is an LRU bounded at [[MaxEntries]]: the eldest relation is
  * unpersisted when a distinct (corpus, parameters) combination would
  * otherwise pin storage for the session lifetime. Long-lived drivers
  * (Bench, notebooks) should still call [[clear]] between corpora — an
  * identical plan string over REWRITTEN underlying files would return the
  * stale pinned relation, the usual contract of Spark's own table cache.
  */
object RelCache {
  // 96, up from 48 (r12): the 200k-vector scale gates (q340–q344) pin
  // several large derived relations that run lexicographically right
  // before the PPJoin family in a solo bench pass and were evicting its
  // memoized gram relations (q43 solo 2.3 s → 5.4 s median, pure
  // churn). Entries are bench-scale; big-sf sweeps are protected by the
  // Verify heap valve (clear + GC above 60% used heap), not this cap.
  private[graft] val MaxEntries = 96

  // Keyed by the canonicalized plan OBJECT, not its string rendering: plan
  // equality is structural and includes literal data (LocalRelation rows),
  // while toString truncates — two different in-memory corpora with the
  // same schema would otherwise alias to one entry and return stale data.
  private val cache =
    new java.util.LinkedHashMap[(SparkSession, Any), DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, Any), DataFrame]): Boolean = {
        val evict = size() > MaxEntries
        if (evict) e.getValue.unpersist()
        evict
      }
    }

  def persist(df: DataFrame): DataFrame = synchronized {
    val key = (df.sparkSession, df.queryExecution.analyzed.canonicalized)
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      val pinned = df.persist(StorageLevel.MEMORY_AND_DISK)
      cache.put(key, pinned)
      pinned
    }
  }

  def clear(): Unit = synchronized {
    cache.values.forEach(_.unpersist())
    cache.clear()
    keyed.clear()
  }

  /** Storage blocks behind a localCheckpoint'd relation: its plan's
    * LogicalRDD leaves. Released EXPLICITLY on eviction — GC + the
    * ContextCleaner reap unreferenced blocks eventually, but a
    * long-lived driver building >MaxEntries distinct graphs can exhaust
    * executor storage before a full GC runs. A released relation is NOT
    * recomputable (checkpointing truncated its lineage), which is why
    * only entries LEAVING the memo are released, never live ones. */
  private def releaseBlocks(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(false)
      case _ => ()
    }

  // Explicit-key memo for relations whose OUTPUT plan hides their input
  // (localCheckpoint'd iterative builds like knnGraph: the result scans
  // an RDD, so plan-keyed equality can never dedupe two builds). Keys
  // must embed the session, the input's canonicalized plan, and every
  // parameter. Eviction unpersists the evictee's checkpoint blocks
  // (mirroring the plan-keyed cache) — the eldest of MaxEntries live
  // graph builds is cold by construction.
  private val keyed =
    new java.util.LinkedHashMap[Any, DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Any, DataFrame]): Boolean = {
        val evict = size() > MaxEntries
        if (evict) releaseBlocks(e.getValue)
        evict
      }
    }

  /** Memoize `build` under `key`. The build runs OUTSIDE the lock (it
    * launches Spark jobs; holding the memo lock would serialize
    * concurrent Bench queries through one build) — two racers may build
    * twice, the first registration wins and the loser's blocks are
    * released immediately (they were never returned to anyone). */
  def memo(key: Any)(build: => DataFrame): DataFrame = {
    val hit = synchronized(keyed.get(key))
    if (hit != null) hit
    else {
      val built = build
      synchronized {
        val again = keyed.get(key)
        if (again != null) { releaseBlocks(built); again }
        else { keyed.put(key, built); built }
      }
    }
  }
}
