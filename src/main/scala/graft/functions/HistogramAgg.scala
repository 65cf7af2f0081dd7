package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Single-pass fixed-boundary histogram as a typed imperative aggregate:
  * one Array[Long] count vector per partition, merged element-wise — the
  * exact distributed shape of PySpark's `RDD.histogram`
  * (pyspark/core/rdd.py:2347-2366), but running inside Tungsten's
  * ObjectHashAggregate instead of pickled Python workers.
  *
  * Vs the groupBy(bin_id) formulation: no per-row shuffle rows, no dense-bin
  * spine join — the aggregation buffer IS dense, and the shuffle carries one
  * n_bins-long vector per partition (or per group key when grouped). At
  * 100 TB that is the minimum possible traffic for this computation.
  *
  * Bucket semantics identical to [[graft.dist.Binning.binId]]: even-width
  * fast path `min(floor((x-lo)/step), n-1)` (closed last bucket), uneven
  * boundaries by binary search; null/NaN/out-of-range silently dropped
  * (rdd.py:2350-2356). */
case class HistogramAgg(
    child: Expression,
    edges: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val n = edges.size - 1
  private val lo = edges.head
  private val hi = edges.last
  private val evenStep: Double = {
    val steps = edges.sliding(2).map(p => p(1) - p(0)).toVector
    if (steps.max - steps.min < 1e-10) (hi - lo) / n else Double.NaN // rdd.py:2340-2342
  }
  private val edgeArr = edges.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hist_counts expects double input, got ${other.simpleString}")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hist_counts"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](n)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      if (!x.isNaN && x >= lo && x <= hi) {
        val bin =
          if (n == 1) 0 // degenerate min==max bucket (rdd.py:2295-2296)
          else if (!evenStep.isNaN) math.min(((x - lo) / evenStep).toInt, n - 1)
          else {
            // bisect_right(edges, x) - 1, clamped to the closed last bucket
            var b = java.util.Arrays.binarySearch(edgeArr, x)
            if (b < 0) b = -b - 2 // insertion point - 1
            math.min(b, n - 1)
          }
        buf(bin) += 1L
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * n)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(n)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HistogramAgg =
    copy(child = newChildren.head)
}

object HistogramAgg {
  /** Column facade: `hist_counts(x, edges)` → array<long> of n dense bucket
    * counts (aggregate function). */
  def hist_counts(x: Column, edges: Seq[Double]): Column = {
    graft.dist.Binning.validateEdges(edges)
    // consumer-path tuning (r13 verdict #1): keep the hash-agg path on
    // untuned sessions — see SessionTuning
    SessionTuning.ensureActiveSession()
    Bridge.column(HistogramAgg(Bridge.expression(x), edges).toAggregateExpression())
  }
}
