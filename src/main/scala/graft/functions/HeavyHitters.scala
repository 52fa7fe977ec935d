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
  * Buffer: indexed binary min-heap (most-evictable entry at the root,
  * hash map term -> heap slot), so updates and evictions are O(log m) —
  * usable at m ~ 10^5-10^6, not just vocabulary-sized summaries. eval
  * returns entries sorted (cnt desc, err asc, term asc). */
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
    a.foreachEntry { (t, c, e) =>
      b.get(t) match {
        case Some((cb, eb)) => combined.put(t, (c + cb, e + eb))
        case None => combined.put(t, (c + floorB, e + floorB))
      }
    }
    b.foreachEntry { (t, c, e) =>
      if (!combined.contains(t)) combined.put(t, (c + floorA, e + floorA))
    }
    val out = new Summary(m)
    // a term absent from BOTH sides may hide under floorA + floorB; a
    // term cut at this merge hides under its combined cnt. Dropping these
    // floors would let a further merge (multi-level partial aggregation)
    // underestimate absent terms and break the cnt >= true invariant.
    out.evictedFloor = floorA + floorB
    if (combined.size <= m) {
      combined.foreach { case (t, (c, e)) => out.offer(t, c, e) }
    } else {
      val sorted = combined.toArray.sortWith { case ((t1, (c1, e1)), (t2, (c2, e2))) =>
        c1 > c2 || (c1 == c2 && (e1 < e2 || (e1 == e2 && t1 < t2)))
      }
      sorted.take(m).foreach { case (t, (c, e)) => out.offer(t, c, e) }
      val dropMax = sorted.drop(m).iterator.map(_._2._1).max
      if (dropMax > out.evictedFloor) out.evictedFloor = dropMax
    }
    out
  }

  override def eval(buf: Summary): Any = {
    // fill a preallocated array straight off the heap slots — no
    // intermediate map/boxing on the per-group output path
    val arr = new Array[(String, Long, Long)](buf.size)
    var i = 0
    buf.foreachEntry { (t, c, e) => arr(i) = (t, c, e); i += 1 }
    val sorted = arr.sortWith { case ((t1, c1, e1), (t2, c2, e2)) =>
      c1 > c2 || (c1 == c2 && (e1 < e2 || (e1 == e2 && t1 < t2)))
    }
    new GenericArrayData(sorted.map { case (t, c, e) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c, e))
    })
  }

  override def serialize(buf: Summary): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(buf.evictedFloor)
    out.writeInt(buf.size)
    buf.foreachEntry { (t, c, e) =>
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
      s.offer(t, c, e) // n <= m: insert path only, never evicts
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
    * evicts the min-count entry (ties: max err, then max term — the
    * entry the output ordering ranks last) and the newcomer inherits
    * its count as error floor.
    *
    * Layout: indexed binary min-heap over parallel arrays with the
    * most-evictable entry at slot 0, plus a term -> slot hash map, so
    * the eviction victim is read off the root and every offer costs
    * O(log m) sift work at worst (O(1) when the heap property already
    * holds, the common case for a counter that only grows). That keeps
    * the summary usable at m ~ 10^5-10^6, where the previous O(m)
    * min-scan per eviction degraded quadratically. Semantics (counts,
    * floors, deterministic tie-breaks) are unchanged — pinned by the
    * scan-vs-heap equivalence spec. */
  final class Summary(m: Int) {
    // arrays grow geometrically up to m: a per-group aggregation buffer
    // must not eagerly pay for the full capacity (ObjectHashAggregate
    // allocates one Summary PER GROUP — at m ~ 10^6 and many groups,
    // eager length-m arrays would be a multi-GB regression vs the old
    // entry-count-sized map; most groups hold far fewer than m terms)
    private var terms = new Array[String](math.min(m, 16))
    private var cnts = new Array[Long](math.min(m, 16))
    private var errs = new Array[Long](math.min(m, 16))
    private var n = 0

    private def ensureCapacity(): Unit = if (n == terms.length && n < m) {
      val cap = math.min(m, math.max(terms.length * 2, 16))
      terms = java.util.Arrays.copyOf(terms, cap)
      cnts = java.util.Arrays.copyOf(cnts, cap)
      errs = java.util.Arrays.copyOf(errs, cap)
    }
    private val pos = mutable.HashMap[String, Int]()
    /** max count ever evicted — the floor absent terms may hide under */
    var evictedFloor: Long = 0L

    def floor: Long = evictedFloor
    def size: Int = n

    // true if slot i must be evicted before slot j (heap order)
    private def evictsBefore(i: Int, j: Int): Boolean =
      cnts(i) < cnts(j) || (cnts(i) == cnts(j) && (errs(i) > errs(j) ||
        (errs(i) == errs(j) && terms(i) > terms(j))))

    private def swap(i: Int, j: Int): Unit = {
      val t = terms(i); terms(i) = terms(j); terms(j) = t
      val c = cnts(i); cnts(i) = cnts(j); cnts(j) = c
      val e = errs(i); errs(i) = errs(j); errs(j) = e
      pos.put(terms(i), i); pos.put(terms(j), j)
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0 && evictsBefore(i, (i - 1) / 2)) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      var continue = true
      while (continue) {
        val l = 2 * i + 1
        var s = i
        if (l < n && evictsBefore(l, s)) s = l
        if (l + 1 < n && evictsBefore(l + 1, s)) s = l + 1
        if (s == i) continue = false else { swap(i, s); i = s }
      }
    }

    def offer(t: String, c: Long, e: Long): Unit = pos.get(t) match {
      case Some(i) =>
        cnts(i) += c; errs(i) += e
        // cnt growth moves the entry away from the root, err growth
        // toward it; at most one of the two sifts moves anything
        siftDown(i); siftUp(pos(t))
      case None =>
        if (n < m) {
          ensureCapacity()
          terms(n) = t; cnts(n) = c; errs(n) = e; pos.put(t, n); n += 1
          siftUp(n - 1)
        } else {
          val minC = cnts(0)
          if (minC > evictedFloor) evictedFloor = minC
          pos.remove(terms(0))
          terms(0) = t; cnts(0) = minC + c; errs(0) = minC + e
          pos.put(t, 0)
          siftDown(0)
        }
    }

    def get(t: String): Option[(Long, Long)] =
      pos.get(t).map(i => (cnts(i), errs(i)))

    def foreachEntry(f: (String, Long, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(terms(i), cnts(i), errs(i)); i += 1 }
    }

    /** snapshot as a map (merge building, specs); heap order is internal */
    def entries: Map[String, (Long, Long)] = {
      val b = Map.newBuilder[String, (Long, Long)]
      foreachEntry((t, c, e) => b += (t -> ((c, e))))
      b.result()
    }
  }

  /** Column API: full summary as array of (term, cnt, err), best-first. */
  def heavy_hitters(term: Column, m: Int): Column =
    GraftShim.column(
      HeavyHitters(GraftShim.expression(term), m).toAggregateExpression())
}
