package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded bottom-k ids by (key asc, id asc) — the aggregate behind exact
  * deterministic per-group reservoir sampling: order docs by a uniform
  * 60-bit hash and keep the k smallest. Map-side partial (at most k rows
  * per group per map partition through the shuffle), unlike a per-group
  * row_number window, which funnels a group's ENTIRE volume through one
  * reducer. Total order over unique (key, id) pairs makes the result
  * partitioning-independent. */
case class BottomKByKey(
    key: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKByKey.Heap] {
  require(k > 0)

  override def children: Seq[Expression] = Seq(key, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): BottomKByKey.Heap = new BottomKByKey.Heap(k)

  override def update(buf: BottomKByKey.Heap, row: InternalRow): BottomKByKey.Heap = {
    val kv = key.eval(row)
    val iv = id.eval(row)
    if (kv != null && iv != null)
      buf.push(kv.asInstanceOf[Long], iv.asInstanceOf[Long])
    buf
  }

  override def merge(a: BottomKByKey.Heap, b: BottomKByKey.Heap): BottomKByKey.Heap = {
    var i = 0
    while (i < b.size) { a.push(b.keys(i), b.ids(i)); i += 1 }
    a
  }

  /** Kept ids, ordered by (key asc, id asc). */
  override def eval(buf: BottomKByKey.Heap): Any = {
    val idx = Array.range(0, buf.size).sortWith { (x, y) =>
      buf.keys(x) < buf.keys(y) || (buf.keys(x) == buf.keys(y) && buf.ids(x) < buf.ids(y))
    }
    new GenericArrayData(idx.map(buf.ids(_)))
  }

  override def serialize(buf: BottomKByKey.Heap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.keys(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKByKey.Heap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new BottomKByKey.Heap(k)
    var i = 0
    while (i < n) { h.push(bb.getLong, bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKByKey =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKByKey =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BottomKByKey =
    copy(key = c(0), id = c(1))
}

object BottomKByKey {

  /** Worst-at-root bounded heap; `worse` = larger key, then larger id. */
  final class Heap(k: Int) {
    val keys = new Array[Long](k)
    val ids = new Array[Long](k)
    var size: Int = 0

    private def worse(k1: Long, i1: Long, k2: Long, i2: Long): Boolean =
      k1 > k2 || (k1 == k2 && i1 > i2)

    def push(key: Long, id: Long): Unit = {
      if (size < k) {
        keys(size) = key; ids(size) = id; size += 1
        var c = size - 1
        while (c > 0 && worse(keys(c), ids(c), keys((c - 1) / 2), ids((c - 1) / 2))) {
          swap(c, (c - 1) / 2); c = (c - 1) / 2
        }
      } else if (worse(keys(0), ids(0), key, id)) {
        keys(0) = key; ids(0) = id
        var c = 0
        var done = false
        while (!done) {
          val l = 2 * c + 1; val r = 2 * c + 2
          var w = c
          if (l < size && worse(keys(l), ids(l), keys(w), ids(w))) w = l
          if (r < size && worse(keys(r), ids(r), keys(w), ids(w))) w = r
          if (w == c) done = true else { swap(c, w); c = w }
        }
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val tk = keys(a); keys(a) = keys(b); keys(b) = tk
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }
  }

  def bottom_k(key: Column, id: Column, k: Int): Column =
    GraftShim.column(
      BottomKByKey(GraftShim.expression(key), GraftShim.expression(id), k)
        .toAggregateExpression())
}
