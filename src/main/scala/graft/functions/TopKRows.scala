package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact per-group top-k as a native `TypedImperativeAggregate` — the
  * scale-correct alternative to `row_number() OVER (...) <= k`: a window
  * sorts each partition in full (O(n log n) and a big sort buffer per
  * group); this aggregate keeps a bounded k-element heap per group,
  * updates in O(log k), and merges partially on the map side, so a
  * 100 TB group costs O(n log k) with O(k) state.
  *
  * Concrete shape for the lineitem ranking: input rows
  * `(price double, orderkey long, linenumber int)`, ordered by
  * (price DESC, orderkey ASC, linenumber ASC); the result is
  * `array<struct<rn int, l_orderkey long, l_linenumber int>>`, ranks
  * assigned 1..k in order.
  */
case class TopKRows(
    price: Expression,
    orderkey: Expression,
    linenumber: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long, Int)]] {

  // rank key K(e) = (-price, orderkey, linenumber); strongest = smallest
  // K. PriorityQueue.dequeue removes the MAXIMUM under its Ordering, so a
  // queue ordered by K drops the weakest entry when it exceeds k.
  private val rankKey: Ordering[(Double, Long, Int)] =
    Ordering.by[(Double, Long, Int), (Double, Long, Long)] { case (p, o, l) =>
      (-p, o.toLong, l.toLong)
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long, Int)] =
    mutable.PriorityQueue.empty(rankKey)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long, Int)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long, Int)] = {
    val p = price.eval(input)
    val o = orderkey.eval(input)
    val l = linenumber.eval(input)
    if (p != null && o != null && l != null) {
      buf.enqueue((p.asInstanceOf[Double], o.asInstanceOf[Long], l.asInstanceOf[Int]))
      if (buf.size > k) buf.dequeue(): Unit // drops the head = weakest
    }
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[(Double, Long, Int)],
      b: mutable.PriorityQueue[(Double, Long, Int)]): mutable.PriorityQueue[(Double, Long, Int)] = {
    b.foreach { e =>
      a.enqueue(e)
      if (a.size > k) a.dequeue(): Unit
    }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long, Int)]): Any = {
    val sorted = buf.toArray.sorted(rankKey) // ascending K = strongest first
    new GenericArrayData(sorted.zipWithIndex.map { case ((p, o, l), i) =>
      InternalRow(i + 1, o, l)
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long, Int)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (p, o, l) => out.writeDouble(p); out.writeLong(o); out.writeInt(l) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long, Int)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.enqueue((in.readDouble(), in.readLong(), in.readInt()))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rn", IntegerType, nullable = false),
    StructField("l_orderkey", LongType, nullable = false),
    StructField("l_linenumber", IntegerType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(price, orderkey, linenumber)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(price = newChildren(0), orderkey = newChildren(1), linenumber = newChildren(2))
  override def prettyName: String = "topk_rows"
}
