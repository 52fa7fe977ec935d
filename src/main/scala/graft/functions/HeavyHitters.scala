package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy hitters (Metwally et al.): bounded-memory frequent
  * items with mergeable summaries (Agarwal et al., "Mergeable Summaries").
  *
  * The exact top-terms formulation (q88) counts the FULL vocabulary —
  * fine while vocabularies are small, impossible at 100 TB n-gram scale.
  * SpaceSaving bounds state at `m` entries per group per partial
  * aggregate with the classic guarantees: every true count c(t) satisfies
  * cnt(t) - err(t) <= c(t) <= cnt(t), any term with c(t) > N/m is
  * guaranteed present, and summaries merge associatively (missing terms
  * adopt the other side's worst-case floor). When `m` >= the group's
  * distinct-term count the summary never evicts and is EXACT with err = 0
  * in every entry — the regime the oracle gate runs in; the approximate
  * regime's bounds are pinned by spec instead (eviction order makes exact
  * counts partitioning-dependent there, so no hash gate is possible by
  * construction).
  *
  * Buffer: hash map term -> (cnt, err); eviction scans for the min-count
  * entry (O(m), amortized fine for the m ~ 10^3-10^4 this operator is
  * sized for — the point is bounding state, not per-row constant
  * factors). eval returns entries sorted (cnt desc, err asc, term asc). */
case class HeavyHitters(
    term: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHitters.Summary] {
  require(m > 0)

  import HeavyHitters.Summary

  override def children: Seq[Expression] = Seq(term)
  // analysis-time type contract (SQL callers would otherwise fail at
  // executor runtime with a ClassCastException on non-string columns;
  // AbstractDataType is private[sql] in Spark 4, so check directly
  // instead of mixing in ImplicitCastInputTypes)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (term.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters needs a STRING term column, got ${term.dataType.catalogString}")
  override def nullable: Boolean = false
  override def dataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("term",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("err",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): Summary = new Summary(m)

  override def update(buf: Summary, row: InternalRow): Summary = {
    val t = term.eval(row)
    if (t != null) buf.offer(t.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(a: Summary, b: Summary): Summary = {
    // mergeable-summaries rule (Agarwal et al.): combine counts with terms
    // absent from one side adopting that side's worst-case floor, then cut
    // back to the top m — NOT re-offered through the eviction path, whose
    // newcomer-inherits-min rule is only valid for unit increments and
    // would inflate bulk counts.
    val floorA = a.floor
    val floorB = b.floor
    val combined = mutable.HashMap[String, (Long, Long)]()
    a.entries.foreach { case (t, (c, e)) =>
      b.entries.get(t) match {
        case Some((cb, eb)) => combined.put(t, (c + cb, e + eb))
        case None => combined.put(t, (c + floorB, e + floorB))
      }
    }
    b.entries.foreach { case (t, (c, e)) =>
      if (!combined.contains(t)) combined.put(t, (c + floorA, e + floorA))
    }
    val out = new Summary(m)
    // a term absent from BOTH sides may hide under floorA + floorB; a
    // term cut at this merge hides under its combined cnt. Dropping these
    // floors would let a further merge (multi-level partial aggregation)
    // underestimate absent terms and break the cnt >= true invariant.
    out.evictedFloor = floorA + floorB
    if (combined.size <= m) {
      combined.foreach { case (t, ce) => out.entries.put(t, ce) }
    } else {
      val sorted = combined.toArray.sortWith { case ((t1, (c1, e1)), (t2, (c2, e2))) =>
        c1 > c2 || (c1 == c2 && (e1 < e2 || (e1 == e2 && t1 < t2)))
      }
      sorted.take(m).foreach { case (t, ce) => out.entries.put(t, ce) }
      val dropMax = sorted.drop(m).iterator.map(_._2._1).max
      if (dropMax > out.evictedFloor) out.evictedFloor = dropMax
    }
    out
  }

  override def eval(buf: Summary): Any = {
    val sorted = buf.entries.toArray.sortWith { case ((t1, (c1, e1)), (t2, (c2, e2))) =>
      c1 > c2 || (c1 == c2 && (e1 < e2 || (e1 == e2 && t1 < t2)))
    }
    new GenericArrayData(sorted.map { case (t, (c, e)) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c, e))
    })
  }

  override def serialize(buf: Summary): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(buf.evictedFloor)
    out.writeInt(buf.entries.size)
    buf.entries.foreach { case (t, (c, e)) =>
      val bytes = t.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes)
      out.writeLong(c); out.writeLong(e)
    }
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Summary = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val s = new Summary(m)
    s.evictedFloor = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val tb = new Array[Byte](len); in.readFully(tb)
      val t = new String(tb, "UTF-8")
      val c = in.readLong(); val e = in.readLong()
      s.entries.put(t, (c, e))
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHitters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHitters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HeavyHitters =
    copy(term = c(0))
}

object HeavyHitters {

  /** SpaceSaving summary: at most m entries; offering over capacity
    * evicts the min-count entry and the newcomer inherits its count as
    * error floor.
    *
    * Capacity bound: eviction is an O(m) min-scan per over-capacity
    * insert, so per-partition update cost is O(tokens x m) in the worst
    * case — sized for the documented m ~ 10^3-10^4 (top-k vocabularies),
    * where the scan is a few microseconds and the summary stays
    * cache-resident. Do NOT size m >= ~10^5: memory is fine but update
    * cost degrades quadratically; at that scale the right structure is a
    * min-heap + hash (Stream-Summary), or simply the exact tf aggregation
    * (a vocabulary-sized shuffle is cheap when you can afford 10^5-entry
    * summaries per partition). */
  final class Summary(m: Int) {
    val entries = mutable.HashMap[String, (Long, Long)]()
    /** max count ever evicted — the floor absent terms may hide under */
    var evictedFloor: Long = 0L

    def floor: Long = evictedFloor

    def offer(t: String, c: Long, e: Long): Unit = entries.get(t) match {
      case Some((c0, e0)) => entries.put(t, (c0 + c, e0 + e))
      case None =>
        if (entries.size < m) entries.put(t, (c, e))
        else {
          // evict the min-count entry (ties: max err, then max term — the
          // entry the output ordering ranks last)
          var minT: String = null; var minC = Long.MaxValue; var minE = -1L
          entries.foreach { case (t0, (c0, e0)) =>
            if (c0 < minC || (c0 == minC && (e0 > minE ||
                (e0 == minE && (minT == null || t0 > minT))))) {
              minT = t0; minC = c0; minE = e0
            }
          }
          entries.remove(minT)
          if (minC > evictedFloor) evictedFloor = minC
          entries.put(t, (minC + c, minC + e))
        }
    }
  }

  /** Column API: full summary as array of (term, cnt, err), best-first. */
  def heavy_hitters(term: Column, m: Int): Column =
    GraftShim.column(
      HeavyHitters(GraftShim.expression(term), m).toAggregateExpression())
}
