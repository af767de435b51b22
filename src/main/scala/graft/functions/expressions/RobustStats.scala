package graft.functions.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** One-pass robust outlier statistics as a native Catalyst aggregate
  * (`graft_robust_stats(v)` over an integer column): per group it returns
  * `struct(n_rows, med, mad, n_outliers, max_out)` where `med` is the
  * exact interpolated median, `mad = median(|v - med|)`, and a row is an
  * outlier iff `|v - med| > 3 * mad` — the median/MAD audit whose
  * thresholds the outliers themselves cannot shift (unlike mean/stddev).
  *
  * Why a TypedImperativeAggregate instead of two `percentile` passes with
  * broadcast-joined thresholds (the compositional form this replaced,
  * PipelineQueries `dq_outliers`): the buffer is a value→count map — the
  * VALUE DOMAIN of the group, exactly the internal representation Spark's
  * own `percentile` builds — so the partial aggregation is the map-side
  * reduction to the domain, the shuffle ships one (value, count) pair per
  * distinct value per partition, and the merge is a count-map union. All
  * three derived statistics then come out of ONE finalize over the merged
  * domain, so the whole audit is a single aggregation stage over the raw
  * table instead of three passes + two broadcast builds. At 100 TB the
  * memory bound per buffer is the per-group value domain (bounded for
  * integer cents — prices repeat), identical to the explicit
  * `(group, value, n)` pre-aggregate, with two fewer shuffles and no
  * broadcast jobs.
  *
  * Exactness contract (what makes this oracle-twinnable with DuckDB's
  * `quantile_cont`): medians interpolate at `pos = 0.5 * (N - 1)` between
  * the expanded-multiset values at floor(pos)/ceil(pos) — the same
  * definition DuckDB and Spark's `percentile` use. On integer inputs med
  * ends in .0/.5 and mad in .0/.25/.5/.75, all exact binary fractions, so
  * the doubles are bit-equal cross-engine. The MAD pass never re-sorts:
  * with values sorted ascending, |v - med| in ascending order is the
  * two-pointer merge walking left (descending) and right (ascending) from
  * the median insertion point — O(domain), not O(domain log domain).
  */
case class RobustStatsAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int,
    override val inputAggBufferOffset: Int)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  def this(child: Expression) = this(child, 0, 0)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_robust_stats expects a bigint input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      buf(k) = buf.getOrElse(k, 0L) + 1L
    }
    buf
  }

  override def merge(b1: mutable.LongMap[Long], b2: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    b2.foreach { case (k, n) => b1(k) = b1.getOrElse(k, 0L) + n }
    b1
  }

  /** Weighted interpolated p50 over `counts` aligned with ascending
    * `vals`, per the quantile_cont definition. Returns NaN-free exact
    * doubles for integer/half-integer inputs. */
  private def weightedMedian(vals: Array[Double], counts: Array[Long], total: Long): Double = {
    val pos = 0.5 * (total - 1).toDouble
    val kLo = math.floor(pos).toLong
    val kHi = math.ceil(pos).toLong
    var cum = 0L
    var vLo = Double.NaN
    var vHi = Double.NaN
    var i = 0
    while (i < vals.length && (cum <= kHi)) {
      cum += counts(i)
      if (vLo.isNaN && cum > kLo) vLo = vals(i)
      if (vHi.isNaN && cum > kHi) vHi = vals(i)
      i += 1
    }
    vLo + (vHi - vLo) * (pos - kLo.toDouble)
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    if (buf.isEmpty) return null
    val m = buf.size
    val vals = new Array[Long](m)
    val cnts = new Array[Long](m)
    var i = 0
    buf.foreach { case (k, n) => vals(i) = k; cnts(i) = n; i += 1 }
    // Sort the (value, count) domain ascending by value.
    val order = Array.range(0, m).sortBy(vals(_))
    val sv = order.map(vals(_))
    val sc = order.map(cnts(_))
    var total = 0L
    sc.foreach(total += _)

    val med = weightedMedian(sv.map(_.toDouble), sc, total)

    // MAD without a second sort: split at the median insertion point and
    // two-pointer merge |v - med| ascending from both sides.
    var r = 0
    while (r < m && sv(r).toDouble < med) r += 1
    var l = r - 1 // sv(l) < med <= sv(r)
    val av = new Array[Double](m)
    val ac = new Array[Long](m)
    var j = 0
    while (j < m) {
      val dl = if (l >= 0) med - sv(l).toDouble else Double.PositiveInfinity
      val dr = if (r < m) sv(r).toDouble - med else Double.PositiveInfinity
      if (dl <= dr) { av(j) = dl; ac(j) = sc(l); l -= 1 }
      else { av(j) = dr; ac(j) = sc(r); r += 1 }
      j += 1
    }
    val mad = weightedMedian(av, ac, total)

    val thresh = mad * 3.0
    var nOut = 0L
    // Sentinel only when NO outlier exists — a genuinely negative max
    // outlier value must survive, so track presence via nOut, not -1.
    var maxOut = Long.MinValue
    var t = 0
    while (t < m) {
      if (math.abs(sv(t).toDouble - med) > thresh) {
        nOut += sc(t)
        if (sv(t) > maxOut) maxOut = sv(t)
      }
      t += 1
    }
    if (nOut == 0L) maxOut = -1L
    new GenericInternalRow(Array[Any](total, med, mad, nOut, maxOut))
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (k, n) => bb.putLong(k); bb.putLong(n) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { buf(bb.getLong()) = bb.getLong(); i += 1 }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_rows", LongType, nullable = false),
    StructField("med", DoubleType, nullable = false),
    StructField("mad", DoubleType, nullable = false),
    StructField("n_outliers", LongType, nullable = false),
    StructField("max_out", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_robust_stats"
  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): RobustStatsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RobustStatsAgg =
    copy(inputAggBufferOffset = newOffset)
}
