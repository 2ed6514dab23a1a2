package graft.functions

import org.apache.datasketches.kll.KllLongsSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Mergeable KLL quantile sketches as native aggregates — the
  * distributed-percentile pattern q64 (exact) and q73
  * (`approx_percentile`) point at for 100 TB: per-partition/per-day
  * sketches of bounded size (k=200 ⇒ ~1.7% normalized rank error) that
  * UNION to the global summary without revisiting the data, the exact
  * analog of q137's HLL daily-merge but for quantiles. Both aggregates
  * are `TypedImperativeAggregate`s: the buffer stays a live heap sketch
  * between rows and serializes only at shuffle boundaries (a typed
  * `Aggregator` with a bytes buffer would pay heapify+serialize per
  * row).
  *
  * [[KllBuildSketch]] folds a long column into a sketch;
  * [[KllMergeSketch]] unions already-built sketch blobs. Estimates are
  * extracted from the final few result blobs driver-side (cold path) —
  * KLL compaction is randomized, so results carry rank-error bounds,
  * not oracle hashes (rows-only gate; tolerance pinned in
  * AnalyticsSpec).
  */
abstract class KllSketchAgg
    extends TypedImperativeAggregate[KllLongsSketch] with UnaryLike[Expression] {
  def k: Int
  override def createAggregationBuffer(): KllLongsSketch =
    KllLongsSketch.newHeapInstance(k)
  override def eval(buf: KllLongsSketch): Any = buf.toByteArray
  override def serialize(buf: KllLongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllLongsSketch =
    KllLongsSketch.heapify(Memory.wrap(bytes))
  override def merge(a: KllLongsSketch, b: KllLongsSketch): KllLongsSketch = {
    a.merge(b); a
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** `kll_build(longCol, k)` → binary sketch blob. */
case class KllBuildSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends KllSketchAgg {
  override def update(buf: KllLongsSketch, input: InternalRow): KllLongsSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }
  override protected def withNewChildInternal(c: Expression): KllBuildSketch =
    copy(child = c)
  override def withNewMutableAggBufferOffset(n: Int): KllBuildSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllBuildSketch =
    copy(inputAggBufferOffset = n)
  override def prettyName: String = "kll_build"
}

/** `kll_merge(binaryCol, k)` → binary sketch blob (union of the
  * inputs). */
case class KllMergeSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends KllSketchAgg {
  override def update(buf: KllLongsSketch, input: InternalRow): KllLongsSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllLongsSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }
  override protected def withNewChildInternal(c: Expression): KllMergeSketch =
    copy(child = c)
  override def withNewMutableAggBufferOffset(n: Int): KllMergeSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllMergeSketch =
    copy(inputAggBufferOffset = n)
  override def prettyName: String = "kll_merge"
}
