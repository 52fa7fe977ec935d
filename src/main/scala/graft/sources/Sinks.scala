package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-layout sinks: the storage-side half of the 100 TB shuffle
  * story. A corpus written bucketed by its join/group key gives every
  * downstream equi-join, groupBy and dedup on that key a scan that
  * already satisfies the required HashPartitioning — Catalyst's
  * EnsureRequirements inserts NO exchange, so the per-run shuffle is
  * paid ONCE at write time instead of on every query. The natural keys
  * here: documents by doc_id (dedup verdict joins, curation
  * intersections), events by user_id (funnel/session/as-of), embeddings
  * by vec_id. PlanShapeSpec pins the no-exchange join plan as a
  * regression guard. */
object Sinks {

  /** Write `df` as a bucketed (optionally sort-within-bucket) managed
    * parquet table. `nBuckets` should match the downstream
    * `spark.sql.shuffle.partitions` divisor on the cluster (both sides
    * of a co-located join must agree on the bucket count).
    *
    * Overwrite means OVERWRITE across sessions too: a managed table's
    * location can outlive the (in-memory) catalog entry that created it
    * — a fresh session's saveAsTable then fails LOCATION_ALREADY_EXISTS
    * on a table it has never heard of. An orphaned location (directory
    * present, no catalog entry) is deleted before the write; a location
    * the CURRENT catalog knows is left for saveAsTable's own
    * overwrite path. The location is resolved through the
    * SessionCatalog's own default-path rule (handles database-qualified
    * names: db.tbl lives under <warehouse>/db.db/tbl, not
    * <warehouse>/db.tbl), never by string concatenation.
    *
    * CONCURRENCY CAVEAT: with per-session in-memory catalogs, a
    * directory this session's catalog has no entry for may still be
    * owned by a concurrent LIVE session's catalog — the orphan check
    * cannot see that. Callers sharing one warehouse across concurrent
    * sessions must namespace table names per session (the q345 gate
    * suffixes an input-dir hash for exactly this reason). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    val s = df.sparkSession
    if (!s.catalog.tableExists(table)) {
      val ident = s.sessionState.sqlParser.parseTableIdentifier(table)
      val p = new org.apache.hadoop.fs.Path(
        s.sessionState.catalog.defaultTablePath(ident))
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }
}
