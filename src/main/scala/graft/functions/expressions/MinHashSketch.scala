package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass grouped MinHash sketch as a native Catalyst aggregate
  * (`graft_minhash`): per group, the element-wise minimum of `numHashes`
  * seeded universal hashes over the input strings — the sketch whose
  * component-match fraction estimates Jaccard similarity between groups.
  *
  * Why TypedImperativeAggregate (NOTES.md backlog → built): the buffer is
  * a primitive long[32] that Spark partially aggregates MAP-SIDE
  * (ObjectHashAggregate) and merges at the shuffle — at 100 TB each
  * partition ships 256 bytes per group instead of its shingle stream,
  * which is the entire point of a sketch. The hash family is the same
  * md5-derived PortableHash ≡ JvmHash pair used everywhere else
  * (JvmHashSpec pins the equivalence), so signatures are deterministic
  * cross-run and cross-partitioning, and MinHash is duplicate-insensitive
  * by construction (min over a set), so no pre-distinct is needed.
  *
  * Reference lineage: the per-doc MinHash in DedupQueries.minhashBandsOf
  * computes the same family per document in a flatMap; this aggregate is
  * the per-GROUP generalization usable from SQL.
  */
case class MinHashSketch(
    child: Expression,
    numHashes: Int,
    override val mutableAggBufferOffset: Int,
    override val inputAggBufferOffset: Int)
  extends TypedImperativeAggregate[Array[Long]] {

  def this(child: Expression) = this(child, 32, 0, 0)

  // The SQL builder only exposes the 32-hash form; a Scala-side
  // MinHashSketch(child, 0, ...) would otherwise produce an EMPTY buffer
  // and a silently empty sketch (Array.fill tolerates n <= 0).
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_minhash expects a string input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h0 = graft.functions.JvmHash.h60p(v.asInstanceOf[UTF8String].toString)
      var k = 0
      while (k < numHashes) {
        val hv = graft.functions.JvmHash.seeded(h0, k)
        if (hv < buf(k)) buf(k) = hv
        k += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numHashes) { if (b2(k) < b1(k)) b1(k) = b2(k); k += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    var k = 0
    while (k < numHashes) { bb.putLong(buf(k)); k += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash"
  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(inputAggBufferOffset = newOffset)
}
