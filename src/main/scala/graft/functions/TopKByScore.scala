package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k by (score desc, id asc): a TypedImperativeAggregate whose
  * buffer is a k-sized worst-at-root binary heap.
  *
  * The window-function formulation (row_number over partitionBy(query))
  * shuffles EVERY scored row to the query's reducer — |corpus| rows per
  * query. This aggregate does map-side partial top-k, so at most k rows
  * per (query, map partition) reach the shuffle — the difference between
  * O(|corpus|) and O(k x partitions) shuffle volume per query at 100 TB.
  *
  * Deterministic: total order (score desc, id asc) with unique ids; the
  * merged result is independent of partitioning/merge order, matching the
  * window formulation row-for-row.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.Heap] {
  require(k > 0)

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKByScore.Heap = new TopKByScore.Heap(k)

  override def update(buf: TopKByScore.Heap, row: InternalRow): TopKByScore.Heap = {
    val s = score.eval(row)
    val i = id.eval(row)
    if (s != null && i != null)
      buf.push(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKByScore.Heap, b: TopKByScore.Heap): TopKByScore.Heap = {
    var i = 0
    while (i < b.size) { a.push(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKByScore.Heap): Any = {
    val idx = Array.range(0, buf.size).sortWith { (x, y) =>
      val c = java.lang.Double.compare(buf.scores(x), buf.scores(y))
      c > 0 || (c == 0 && buf.ids(x) < buf.ids(y))
    }
    new GenericArrayData(idx.map { j =>
      new GenericInternalRow(Array[Any](buf.scores(j), buf.ids(j)))
    })
  }

  override def serialize(buf: TopKByScore.Heap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.Heap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKByScore.Heap(k)
    var i = 0
    while (i < n) { h.push(bb.getDouble, bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKByScore =
    copy(score = c(0), id = c(1))
}

object TopKByScore {

  /** Worst-at-root bounded heap over (score, id); `worse` = lower score,
    * then higher id. */
  final class Heap(k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size: Int = 0

    /** Total order via Double.compare: NaN sorts GREATEST (matching Spark
      * and DuckDB ORDER BY ... DESC, where NaN ranks first) and the heap
      * invariant never sees an incomparable pair. */
    private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c < 0 || (c == 0 && i1 > i2)
    }

    def push(s: Double, i: Long): Unit = {
      if (size < k) {
        scores(size) = s; ids(size) = i; size += 1
        var c = size - 1
        while (c > 0 && worse(scores(c), ids(c), scores((c - 1) / 2), ids((c - 1) / 2))) {
          swap(c, (c - 1) / 2); c = (c - 1) / 2
        }
      } else if (worse(scores(0), ids(0), s, i)) {
        scores(0) = s; ids(0) = i
        var c = 0
        var done = false
        while (!done) {
          val l = 2 * c + 1; val r = 2 * c + 2
          var w = c
          if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
          if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
          if (w == c) done = true else { swap(c, w); c = w }
        }
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }
  }

  /** Column API: array of (score, id) structs, best-first. */
  def top_k(score: Column, id: Column, k: Int): Column =
    GraftShim.column(
      TopKByScore(GraftShim.expression(score), GraftShim.expression(id), k)
        .toAggregateExpression())
}
