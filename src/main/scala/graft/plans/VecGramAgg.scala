package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mutable partial state for [[VecGramAgg]]: the packed upper triangle of
  * Σ v·vᵀ over the rows seen so far, plus the row count. `dim == 0` marks
  * an empty buffer (no rows yet). */
final class GramBuffer(var dim: Int, var n: Long, var sums: Array[Long]) {
  def this() = this(0, 0L, Array.emptyLongArray)
}

/** `vec_gram(qv)` — single-pass distributed Gram-matrix accumulation over a
  * quantized (integer) vector column: one `Array[Long]` of the packed
  * upper triangle `Σ qv[i]·qv[j] (i ≤ j)` per group, `n` rows prepended so
  * consumers can turn second moments into covariance.
  *
  * This is the scale-path front-end of embedding preprocessing (PCA /
  * whitening before SemDeDup-style clustering, Abbas et al. 2023, arXiv
  * 2303.09540 — public paper): the d×d second-moment matrix of an N-row
  * embedding table in ONE scan with map-side partial aggregation and
  * O(d²) state per partial — no N×d² row explosion, no shuffle of the
  * embeddings themselves, just d(d+1)/2+2 longs per partition merged
  * associatively. Because the accumulator is INTEGER, the result is
  * independent of partitioning and merge order — which is what makes this
  * aggregate oracle-checkable bit-for-bit against a sequential engine
  * (float Gram sums would drift by merge order; quantize first, then the
  * algebra is exact). Overflow headroom: |qv| ≤ 2^13-scale quantization
  * gives 2^26 per product, so ~2^37 rows per group fit int64; beyond
  * that, widen to DECIMAL partials or shard the sum by row ranges.
  *
  * Output layout: `[n, d, sums...]` — row count, dimension, then the
  * packed triangle row-major (`idx = i·d − i·(i−1)/2 + (j−i)`, 0-based).
  * Rows are skipped when NULL; all non-null rows must share one dimension
  * (a mixed-dim column fails loudly rather than mis-accumulating).
  */
case class VecGramAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_gram"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): GramBuffer = new GramBuffer()

  override def update(buffer: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray()
      if (buffer.dim == 0) {
        buffer.dim = arr.length
        buffer.sums = new Array[Long](arr.length * (arr.length + 1) / 2)
      }
      require(arr.length == buffer.dim,
        s"$prettyName: mixed vector dimensions ${arr.length} vs ${buffer.dim}")
      var i = 0
      var idx = 0
      while (i < arr.length) {
        val vi = arr(i)
        var j = i
        while (j < arr.length) {
          buffer.sums(idx) += vi * arr(j)
          idx += 1
          j += 1
        }
        i += 1
      }
      buffer.n += 1
    }
    buffer
  }

  override def merge(buffer: GramBuffer, other: GramBuffer): GramBuffer =
    if (other.dim == 0) buffer
    else if (buffer.dim == 0) other
    else {
      require(buffer.dim == other.dim,
        s"$prettyName: mixed vector dimensions ${other.dim} vs ${buffer.dim}")
      var k = 0
      while (k < buffer.sums.length) {
        buffer.sums(k) += other.sums(k)
        k += 1
      }
      buffer.n += other.n
      buffer
    }

  override def eval(buffer: GramBuffer): Any =
    new GenericArrayData(
      (Array(buffer.n, buffer.dim.toLong) ++ buffer.sums).map(_.asInstanceOf[Any]))

  override def serialize(buffer: GramBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.dim)
    out.writeLong(buffer.n)
    buffer.sums.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val dim = in.readInt()
    val n = in.readLong()
    val sums = Array.fill(dim * (dim + 1) / 2)(in.readLong())
    new GramBuffer(dim, n, sums)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecGramAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VecGramAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecGramAgg =
    copy(child = newChildren.head)
}
