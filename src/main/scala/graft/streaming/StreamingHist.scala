package graft.streaming

import graft.axes.BinAxis
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators.
  *
  * Streaming histogram = the same single-aggregation plan as the batch
  * operator (graft.operators.Histogram), keyed by (event-time window, bin
  * index) with a watermark bounding state. Spark's incremental HashAggregate
  * maintains per-(window, bin) partial counts — state size is
  * #windows x #bins, independent of event volume.
  */
object StreamingHist {

  /** Event-time windowed histogram: one histogram per tumbling window.
    * Works identically on a batch or streaming DataFrame. */
  def windowedHistogram(df: DataFrame, tsCol: String, x: Column, ax: BinAxis,
      windowDuration: String, watermark: String = "10 seconds"): DataFrame = {
    val base = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    base.filter(ax.keepPred(x, includeUnder = false, includeOver = false))
      .select(window(col(tsCol), windowDuration).as("win"), ax.index(x).as("__i0"))
      .groupBy(col("win"), col("__i0"))
      .agg(count(lit(1)).cast("double").as("cnt"))
      .select(col("win.start").as("window_start"), col("win.end").as("window_end"),
        ax.label(col("__i0")).as(ax.binsCol), col("cnt"))
  }

  case class DocEvent(doc_id: Long, content_hash: String)
  case class DedupVerdict(doc_id: Long, content_hash: String, first_seen: Boolean)

  /** Stateful streaming exact-dedup: first event per content hash passes,
    * later ones are flagged. State is one boolean per distinct hash, keyed
    * by hash — flatMapGroupsWithState (the custom-state path the batch
    * engine can't express).
    *
    * State grows with DISTINCT hashes: at 100 TB that is the corpus's
    * unique-document count, so production deployments bound it with
    * `GroupStateTimeout.ProcessingTimeTimeout` + `setTimeoutDuration`
    * (dedup within a rolling horizon) or periodically compact the state
    * store; NoTimeout here keeps the gated batch semantics exact. */
  def streamingDedup(events: Dataset[DocEvent]): Dataset[DedupVerdict] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.content_hash)
      .flatMapGroupsWithState[Boolean, DedupVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (hash: String, it: Iterator[DocEvent], state: GroupState[Boolean]) =>
          val seenBefore = state.getOption.getOrElse(false)
          val batch = it.toSeq.sortBy(_.doc_id)
          state.update(true)
          batch.zipWithIndex.map { case (e, i) =>
            DedupVerdict(e.doc_id, hash, first_seen = !seenBefore && i == 0)
          }.iterator
      }
  }
}
