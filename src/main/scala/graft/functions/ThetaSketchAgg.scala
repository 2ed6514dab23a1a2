package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches, Union, UpdateSketch}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Theta distinct-count sketch as a native aggregate — the SET-ALGEBRA
  * upgrade over HLL (q137): theta sketches support not just union but
  * INTERSECTION and difference, so "users who did A ∧ B" — the audience
  * -overlap question — costs two bounded sketches and a driver-side set
  * op instead of a shuffle-heavy exact distinct-intersection join. The
  * buffer holds a live union operator between rows (serializing an
  * UpdateSketch per row would defeat the point — same reasoning as
  * [[KllBuildSketch]]); the eval/serialize form is the compact
  * immutable sketch. Estimates are randomized by construction →
  * rows-only gate, error pinned in AnalyticsSpec.
  */
case class ThetaBuildSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {
  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()
  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }
  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult); a
  }
  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    u
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override protected def withNewChildInternal(c: Expression): ThetaBuildSketch =
    copy(child = c)
  override def withNewMutableAggBufferOffset(n: Int): ThetaBuildSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaBuildSketch =
    copy(inputAggBufferOffset = n)
  override def prettyName: String = "theta_build"
}

object ThetaSketchAgg {
  /** Driver-side set algebra over serialized sketches (cold path — runs
    * on aggregate-sized result rows, never per event row).
    */
  def wrap(bytes: Array[Byte]): Sketch = Sketches.wrapSketch(Memory.wrap(bytes))
  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(wrap(a)); i.intersect(wrap(b))
    i.getResult.getEstimate
  }
}
