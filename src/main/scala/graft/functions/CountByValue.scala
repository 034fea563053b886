package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `count_by_value(expr)` — per-distinct-value counts as one
  * `map<string, bigint>` aggregate. The one-pass answer to "how many of
  * each error class": bounded by value cardinality (error classes:
  * dozens), map-side partial maps merge by key sum, and the expression is
  * legal inside `Dataset.observe` — so a DLQ spike is diagnosable per
  * class from the SAME single pass that computes the pipeline's output
  * (the reference surfaces the equivalent per-exception-type counts
  * through Kafka Streams metrics).
  *
  * Null inputs are skipped (a frame with zero errors observes an empty
  * map). Map keys are emitted in sorted order for deterministic output.
  */
case class CountByValue(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_by_value"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // clone: the evaluated UTF8String may point into a reused row buffer
      val key = v.asInstanceOf[UTF8String].clone()
      buffer.update(key, buffer.getOrElse(key, 0L) + 1L)
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, n) => buffer.update(k, buffer.getOrElse(k, 0L) + n) }
    buffer
  }

  override def eval(buffer: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buffer.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(sorted.map(_._1.asInstanceOf[Any])),
      new GenericArrayData(sorted.map(_._2.asInstanceOf[Any])))
  }

  override def serialize(buffer: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, n) =>
      val b = k.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(n)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buffer = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buffer.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountByValue =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountByValue =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountByValue =
    copy(child = newChild)
}

object CountByValue {
  def apply(c: Column): Column =
    ColumnBridge.column(CountByValue(ColumnBridge.expression(c))
      .toAggregateExpression())
}
