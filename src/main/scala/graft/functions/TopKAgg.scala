package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Per-group top-k as a typed imperative aggregate: a bounded heap of
  * (ord DOUBLE, id LONG) pairs per group, merged heap-wise — the scale
  * path for "top N per group" queries.
  *
  * Vs the `row_number().over(Window.partitionBy(g).orderBy(...))` +
  * `filter(rnk <= k)` formulation: the window shuffles and SORTS every
  * row of every group before discarding all but k of them, while this
  * aggregate's map-side partial keeps at most k pairs per group per task,
  * so the exchange carries ≤ k·|groups| pairs and nothing is ever
  * globally sorted. At 100 TB with thousands of rows per group that is
  * the difference between shuffling the table and shuffling the answer.
  *
  * Ordering matches the window idiom `orderBy(ord DESC, id ASC)`: higher
  * ord wins, ties broken by smaller id — fully deterministic under any
  * partitioning, which also makes results reproducible across engines
  * (the DuckDB oracle runs the row_number formulation). Null/NaN ord and
  * null id rows are dropped, mirroring a window sort's NULLS LAST
  * falling outside any top-k worth keeping.
  *
  * Output: `array<struct<ord double, id bigint>>` sorted best-first;
  * `posexplode` turns it into ranked rows. */
case class TopKAgg(
    ord: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k >= 1, "top_k_by requires k >= 1")

  // PriorityQueue dequeues the MAX of its ordering; ranking "more worse"
  // as greater makes head/dequeue yield the current weakest pair, so a
  // full buffer evicts correctly in O(log k)
  private val worseFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1) // smaller ord = worse
      if (c != 0) c else java.lang.Long.compare(a._2, b._2) // larger id = worse
    }
  }

  override def checkInputDataTypes(): TypeCheckResult = (ord.dataType, id.dataType) match {
    case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (o, i) => TypeCheckResult.TypeCheckFailure(
      s"top_k_by expects (double, bigint) inputs, got (${o.simpleString}, ${i.simpleString})")
  }

  override def children: Seq[Expression] = Seq(ord, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k_by"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worseFirst)

  private def push(buf: mutable.PriorityQueue[(Double, Long)], p: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(p)
    else if (worseFirst.compare(p, buf.head) < 0) { // p less-worse than the weakest
      buf.dequeue(); buf.enqueue(p)
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null) {
      val x = o.asInstanceOf[Double]
      if (!x.isNaN) push(buf, (x, i.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Double, Long)],
                     b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach(push(a, _))
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // best-first: ascending by worseFirst IS least-worse-first
    val arr = buf.toArray.sorted(worseFirst)
    new GenericArrayData(arr.map { case (o, i) =>
      new GenericInternalRow(Array[Any](o, i)): Any
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (o, i) => bb.putDouble(o); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((bb.getDouble, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(ord = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  /** Column facade: `top_k_by(ord, id, k)` → `array<struct<ord, id>>` of the
    * k best (ord desc, id asc) pairs in the group (aggregate function). */
  def top_k_by(ord: Column, id: Column, k: Int): Column = {
    // consumer-path tuning (r13 verdict #1): an untuned session planning
    // this agg past 128 keys/partition would external-sort its whole input
    SessionTuning.ensureActiveSession()
    Bridge.column(TopKAgg(Bridge.expression(ord), Bridge.expression(id), k)
      .toAggregateExpression())
  }
}
