package graft.functions

import org.apache.datasketches.theta.{SetOperation, Union}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Theta-sketch distinct aggregate (`theta_agg(bigint)` → compact blob)
  * over the DataSketches library in Spark's jars. Theta is the sketch
  * family with NATIVE set algebra: unlike HLL — whose only operation is
  * union, forcing intersections through inclusion-exclusion with
  * compounding error and making set difference impossible — theta
  * sketches intersect and subtract directly (each keeps a uniform
  * hash-sample of the set below its θ threshold; intersection/AnotB
  * operate on the samples). The aggregate here builds per-group
  * sketches; the set operations run on catalog-sized blobs at readout
  * (see operators.Sketches.thetaSetOps).
  *
  * TypedImperativeAggregate: the live Union object rides the buffer,
  * compact bytes only cross shuffle boundaries — O(k) per group per
  * partition, map-side combined. Default k = 4096 entries: below ~4096
  * distincts the sketch is in EXACT mode (θ = 1, all hashes retained),
  * which is why test-scale audit flags are deterministically green while
  * the same blobs keep working probabilistically at warehouse scale.
  */
case class ThetaAgg(child: Expression, lgK: Int = 12,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any =
    buffer.getResult.toByteArrayCompressed

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArrayCompressed

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(org.apache.datasketches.theta.CompactSketch.heapify(Memory.wrap(bytes)))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): ThetaAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): ThetaAgg =
    copy(child = newChild)
  override def prettyName: String = "theta_agg"
}
