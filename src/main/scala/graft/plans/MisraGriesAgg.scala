package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import graft.core.sketch.MisraGries
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `mg_candidates(col, k)` — Misra-Gries frequent-items candidates as a
  * native Catalyst aggregate (SURVEY §2.10's UDAF surface, sketch
  * flavor): aggregates a string column into the ≤ k surviving candidate
  * keys, in O(k) memory per partial buffer, with map-side partial
  * aggregation and MERGEABLE partials — merging follows Agarwal et al.,
  * PODS'12 ("Mergeable Summaries", §3.1): add counters, and if more than
  * k survive, subtract the (k+1)-th largest count from all and drop the
  * non-positive. The merged summary carries the SAME guarantee as a
  * single-pass summary of the concatenated stream (undercount ≤
  * n/(k+1)), so any item with global frequency > n/(k+1) is in the final
  * candidate array no matter how Spark partitions or schedules the
  * partials — and, unlike the per-partition mapPartitions spelling, the
  * final candidate set is bounded by k TOTAL, not k × partitions.
  *
  * NULL inputs are skipped (they contribute neither a counter nor stream
  * mass); the caller's `count(*)` defines the threshold's n, which can
  * only exceed the sketch's — a larger n raises the threshold, so the
  * guarantee direction is preserved. Output order is sorted for
  * determinism of the ARRAY; the surviving SET beyond the guaranteed
  * items still depends on stream order, which is why consumers recount
  * exactly (q97's two-pass contract).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGries] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "mg_candidates"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): MisraGries = new MisraGries(k)

  override def update(buffer: MisraGries, input: InternalRow): MisraGries = {
    val v = child.eval(input)
    if (v != null) buffer.offer(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MisraGries, other: MisraGries): MisraGries = {
    buffer.absorb(other)
    buffer
  }

  override def eval(buffer: MisraGries): Any =
    new GenericArrayData(
      buffer.candidates.sorted.map(UTF8String.fromString(_): Any).toArray)

  override def serialize(buffer: MisraGries): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buffer.n)
    val snap = buffer.snapshot
    out.writeInt(snap.size)
    snap.foreach { case (item, count) =>
      val bytes = item.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(count)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGries = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val total = in.readLong()
    val size = in.readInt()
    val entries = (0 until size).map { _ =>
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      (new String(buf, "UTF-8"), in.readLong())
    }
    MisraGries.restore(k, total, entries)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}
