package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Fast path for the engine's canonical double→decimal(·,8) conversion:
  * the exact unscaled scale-8 value of
  * `new BigDecimal(Double.toString(x)).setScale(8, HALF_UP)` computed with
  * integer arithmetic directly from the `Double.toString` output, when it
  * fits a long. `Double.toString` (the shortest-repr anchor that DEFINES
  * the engine's conversion semantics — see [[RpDecimal.project]]) emits at
  * most 17 significant digits as `-?d(.d+)(E-?d+)?`, so the digits always
  * accumulate into a long; only results needing > ~19 digits at scale 8
  * (|x| ≳ 10¹⁰ era magnitudes) fall back to the BigDecimal path, which is
  * also where every precision-overflow null lives. A scale-8 digit-parity
  * property spec pins fast == BigDecimal across magnitude sweeps and the
  * exact HALF_UP boundaries. */
private[functions] object Dec8 {
  /** Sentinel: take the BigDecimal path (never a legal result — every
    * fast-path value is magnitude-guarded below Long.MaxValue). */
  final val Fallback = Long.MinValue
  private final val MaxBeforeShift = (Long.MaxValue - 9) / 10

  def scaled8(s: String): Long = {
    val n = s.length
    var i = 0
    var neg = false
    if (s.charAt(0) == '-') { neg = true; i = 1 }
    var u = 0L
    var frac = 0
    var seenDot = false
    var exp = 0
    var done = false
    while (i < n && !done) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        if (u > MaxBeforeShift) return Fallback
        u = u * 10 + (c - '0')
        if (seenDot) frac += 1
        i += 1
      } else if (c == '.') { seenDot = true; i += 1 }
      else if (c == 'E' || c == 'e') {
        i += 1
        var esign = 1
        if (i < n && s.charAt(i) == '-') { esign = -1; i += 1 }
        else if (i < n && s.charAt(i) == '+') i += 1
        var e = 0
        while (i < n) {
          val d = s.charAt(i)
          if (d < '0' || d > '9') return Fallback
          if (e > 100000) return Fallback // absurd exponent: not from toString
          e = e * 10 + (d - '0')
          i += 1
        }
        exp = esign * e
        done = true
      } else return Fallback // "Infinity"/"NaN" — guarded upstream anyway
    }
    val k = frac.toLong - exp // scale of the parsed decimal
    if (k <= 8) {
      val shift = 8 - k
      if (u == 0) return 0L
      if (shift > 18) return Fallback
      var r = u
      var j = 0L
      while (j < shift) {
        if (r > Long.MaxValue / 10) return Fallback
        r *= 10
        j += 1
      }
      if (neg) -r else r
    } else {
      val d = k - 8 // HALF_UP division by 10^d
      if (d >= 20) 0L
      else if (d == 19) {
        // divisor 10^19 exceeds Long.MaxValue; u < 10^19 always, so the
        // quotient is 0 and HALF_UP rounds to ±1 iff u >= 5·10^18
        if (u >= 5000000000000000000L) { if (neg) -1L else 1L } else 0L
      } else {
        var div = 1L
        var j = 0L
        while (j < d) { div *= 10; j += 1 }
        var q = u / div
        val r = u % div
        if (r >= div - r) q += 1 // 2r >= div, overflow-safe form
        if (neg) -q else q
      }
    }
  }
}

/** Mutable buffer of [[DecSumVecAgg]]: per-dim exact decimal sums at scale 8
  * (unscaled values), a per-dim seen flag (SQL `sum` of zero non-null terms
  * is NULL, not 0), and the row count. Longs carry the unscaled sums until
  * an addition would overflow, then that dim escalates to BigInteger — the
  * magnitudes that need it (|Σ| > 9.2·10¹⁸ at scale 8, i.e. ~10¹⁰ unit-scale
  * rows) never occur at the verifier tier this aggregate serves, but the
  * escalation keeps the math exact instead of silently wrapping. */
private[functions] final class DecSumBuf(val dim: Int) {
  val sums = new Array[Long](dim)
  var big: Array[java.math.BigInteger] = null // lazily allocated on overflow
  val seen = new Array[Boolean](dim)
  var count = 0L

  def add(j: Int, unscaled: java.math.BigInteger): Unit = {
    seen(j) = true
    if (big == null && unscaled.bitLength < 63) {
      val l = unscaled.longValue
      val s = sums(j) + l
      // overflow check (Math.addExact without the throw)
      if (((sums(j) ^ s) & (l ^ s)) < 0) escalate()
      else { sums(j) = s; return }
    } else if (big == null) escalate()
    big(j) = big(j).add(unscaled)
  }

  /** Primitive-lane add for the [[Dec8]] fast path: no BigInteger boxing
    * until an addition actually overflows. */
  def addLong(j: Int, l: Long): Unit = {
    seen(j) = true
    if (big == null) {
      val s = sums(j) + l
      if (((sums(j) ^ s) & (l ^ s)) >= 0) { sums(j) = s; return }
      escalate()
    }
    big(j) = big(j).add(java.math.BigInteger.valueOf(l))
  }

  private def escalate(): Unit = {
    big = Array.tabulate(dim)(i => java.math.BigInteger.valueOf(sums(i)))
  }

  def unscaledAt(j: Int): java.math.BigInteger =
    if (big != null) big(j) else java.math.BigInteger.valueOf(sums(j))

  def mergeIn(o: DecSumBuf): Unit = {
    count += o.count
    var j = 0
    while (j < dim) {
      if (o.seen(j)) add(j, o.unscaledAt(j))
      j += 1
    }
  }
}

/** All per-dim decimal matvec sums of the power-iteration tier in ONE
  * aggregate buffer — the r15-watchlist fix for `top_pc_embeddings` /
  * `debias_embeddings`, whose per-iteration cost was DRIVER-side: a
  * 64-aggregate plan (64 independent `sum(cast(((v[j] as double) − m_j) ·
  * s as decimal(28,8)))` columns) analyzed, optimized and codegen'd anew
  * every iteration because the iterate vector rode the tree as 64 changing
  * literals. Here the mean and iterate vectors are constructor arguments
  * (plan-constant reference objects), so each iteration plans ONE
  * imperative aggregate over one buffer, and the generated
  * ObjectHashAggregate code is identical across iterations — the codegen
  * cache hits instead of recompiling (guide §1.2 step 2: per-task work,
  * after the job shape is already minimal at 1 job/iteration).
  *
  * Value-identical to the 64-aggregate tree it replaces, term by term:
  *
  *  - `w == null` (mean pass): dim-j term is `cast(cast(v[j] as double) as
  *    decimal(28,8))` — float→double widening is exact, and the
  *    double→decimal conversion below is Spark's own canonical-string path
  *    (`Double.toString` → `BigDecimal` → `setScale(8, HALF_UP)`, null when
  *    precision exceeds 28 — same as [[RpDecimal.project]]'s terms, proved
  *    oracle-identical in r15). A null ELEMENT nulls only dim j's term
  *    (that dim skips the row), exactly like the per-dim `sum`.
  *  - `w != null` (matvec pass): `s = Σ_j (v[j] − mean_j)·w_j` is the same
  *    left-to-right IEEE double fold as the `reduce(_ + _)` chain it
  *    replaces, and dim-j's term is `cast((v[j] − mean_j) · s as
  *    decimal(28,8))`. A null element anywhere nulls `s`, which nulls
  *    EVERY dim's term for that row — mirrored by skipping the row.
  *  - Decimal addition at a common scale is exact integer addition —
  *    order-free, so partitioning cannot change a digit. SQL `sum` over
  *    zero non-null terms is NULL: mirrored by the per-dim seen flag.
  *  - eval emits `cast(sum as double)` per dim: `BigDecimal(unscaled,
  *    8).doubleValue()`, Spark's `Decimal.toDouble`. The 38-digit
  *    accumulator overflow that nulls the built-in sum is unreachable for
  *    this tier's magnitudes and is deliberately not modeled (the long →
  *    BigInteger escalation keeps the sum exact instead).
  *
  * Returns `array<double>` of length dim (null entries where no term
  * contributed) plus the row count as the last element's companion — the
  * count rides a separate `count(lit(1))` in the same .agg call. */
case class DecSumVecAgg(
    child: Expression,
    dim: Int,
    mean: Array[Double],
    w: Array[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DecSumBuf] {

  require(dim >= 1, s"dim $dim must be >= 1")
  require(mean == null || mean.length == dim, "mean length mismatch")
  require(w == null || w.length == dim, "w length mismatch")
  require(w == null || mean != null, "matvec mode needs a mean vector")

  override def checkInputDataTypes(): TypeCheckResult =
    ArgCheck.arrayOf(child, FloatType, prettyName)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "dec_sum_vec"

  override def createAggregationBuffer(): DecSumBuf = new DecSumBuf(dim)

  /** Spark's Cast(double → decimal(28,8)) under non-ANSI: canonical string
    * → BigDecimal → setScale(8, HALF_UP); precision > 28 → null. NaN and
    * ±Infinity have no decimal value — null (the non-ANSI cast's NULL; the
    * ANSI tree this replaces throws there, so representable data is
    * unaffected). */
  private def addTerm(buf: DecSumBuf, j: Int, x: Double): Unit = {
    if (x.isNaN || x.isInfinite) return // no decimal value: non-ANSI NULL
    val s = java.lang.Double.toString(x)
    // scale-8 long fast path (identical digits — Dec8ParitySpec): ≤ 19
    // digits by construction, so the precision-28 null is only reachable
    // on the BigDecimal fallback
    val f = Dec8.scaled8(s)
    if (f != Dec8.Fallback) { buf.addLong(j, f); return }
    val bd = new java.math.BigDecimal(s)
      .setScale(8, java.math.RoundingMode.HALF_UP)
    if (bd.precision <= 28) buf.add(j, bd.unscaledValue())
  }

  override def update(buf: DecSumBuf, input: InternalRow): DecSumBuf = {
    val v = child.eval(input)
    buf.count += 1L // count(lit(1)) counts the row whatever the elements hold
    if (v == null) return buf // a null vector nulls every term (sum skips)
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    if (w == null) {
      // mean pass: dim-j term is cast(v[j] as decimal(28,8)); a null
      // element skips ONLY dim j
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(j)) addTerm(buf, j, arr.getFloat(j).toDouble)
        j += 1
      }
    } else {
      // matvec pass: s = Σ (v_j − m_j)·w_j (left-to-right double fold);
      // a null element nulls s, which nulls every dim's term for the row
      var s = 0.0
      var j = 0
      while (j < n) {
        if (arr.isNullAt(j)) return buf
        s += (arr.getFloat(j).toDouble - mean(j)) * w(j)
        j += 1
      }
      j = 0
      while (j < n) {
        addTerm(buf, j, (arr.getFloat(j).toDouble - mean(j)) * s)
        j += 1
      }
    }
    buf
  }

  override def merge(a: DecSumBuf, b: DecSumBuf): DecSumBuf = { a.mergeIn(b); a }

  override def eval(buf: DecSumBuf): Any = {
    val out = new Array[Any](dim)
    var j = 0
    while (j < dim) {
      if (buf.seen(j))
        out(j) = new java.math.BigDecimal(buf.unscaledAt(j), 8).doubleValue()
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: DecSumBuf): Array[Byte] =
    DecSumVecAgg.serializeBuf(buf)
  override def deserialize(bytes: Array[Byte]): DecSumBuf =
    DecSumVecAgg.deserializeBuf(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): DecSumVecAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DecSumVecAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): DecSumVecAgg =
    copy(child = newChildren.head)
}

/** N independent exact decimal(prec,8) sums in ONE aggregate buffer — the
  * shared-buffer form of `sum(cast(term_i as decimal(prec,8)))` × N that the
  * exact stats tiers plan (moments: 4 power sums × k columns; correlation:
  * k + k + k(k−1)/2 moment sums). The terms arrive as ONE codegen'd
  * `array(...)` projection (so the double arithmetic stays in whole-stage
  * codegen) and each slot accumulates its unscaled scale-8 value in a
  * primitive long (BigInteger escalation on overflow) instead of driving an
  * independent built-in decimal Sum with its per-row Decimal boxing and
  * 16-byte UnsafeRow buffer write per slot — the probe measured the
  * 15-aggregate moments plan at ~40 s of task time at sf0.1 for ~7 M
  * double→decimal conversions' worth of actual work (guide §1.2 step 2).
  *
  * Term-identical to the tree it replaces: the conversion below is Spark's
  * canonical double→decimal cast (`Double.toString` → `BigDecimal` →
  * `setScale(8, HALF_UP)`, null when precision exceeds `prec` — the exact
  * [[RpDecimal.project]] / [[DecSumVecAgg]] discipline), a null term skips
  * only its slot (SQL sum), a slot with zero non-null terms is NULL, and
  * decimal addition at a fixed scale is exact integer addition — order-free
  * under any partitioning. eval emits `cast(sum as double)` per slot
  * (`BigDecimal(unscaled, 8).doubleValue`, Spark's `Decimal.toDouble`) —
  * the consumers only ever read the sums back through that cast. */
case class DecTermSumsAgg(
    child: Expression,
    n: Int,
    prec: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DecSumBuf] {

  require(n >= 1, s"n $n must be >= 1")
  require(prec >= 9 && prec <= 38, s"prec $prec out of range")

  /** Fast-path precision gate: a scale-8 long can carry up to 19 digits,
    * so below prec 19 a fast-path value of |v| >= 10^prec must null its
    * slot exactly like the cast; 0 = no gate needed (prec >= 19). */
  private val precCap: Long =
    if (prec >= 19) 0L else { var c = 1L; var i = 0; while (i < prec) { c *= 10; i += 1 }; c }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${other.simpleString}")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "dec_term_sums"

  override def createAggregationBuffer(): DecSumBuf = new DecSumBuf(n)

  override def update(buf: DecSumBuf, input: InternalRow): DecSumBuf = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val m = math.min(arr.numElements(), n)
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val x = arr.getDouble(i)
        // NaN/±Inf have no decimal value — skip the slot (the non-ANSI
        // cast's NULL; the ANSI tree this replaces throws there)
        if (!x.isNaN && !x.isInfinite) {
          val s = java.lang.Double.toString(x)
          // scale-8 long fast path (identical digits — Dec8ParitySpec);
          // a fast-path value can carry up to 19 digits, so the
          // precision gate still applies below prec 19
          val f = Dec8.scaled8(s)
          if (f != Dec8.Fallback) {
            if (precCap == 0L || (f < precCap && f > -precCap)) buf.addLong(i, f)
          } else {
            val bd = new java.math.BigDecimal(s)
              .setScale(8, java.math.RoundingMode.HALF_UP)
            if (bd.precision <= prec) buf.add(i, bd.unscaledValue())
          }
        }
      }
      i += 1
    }
    buf
  }

  override def merge(a: DecSumBuf, b: DecSumBuf): DecSumBuf = { a.mergeIn(b); a }

  override def eval(buf: DecSumBuf): Any = {
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (buf.seen(i))
        out(i) = new java.math.BigDecimal(buf.unscaledAt(i), 8).doubleValue()
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: DecSumBuf): Array[Byte] =
    DecSumVecAgg.serializeBuf(buf)
  override def deserialize(bytes: Array[Byte]): DecSumBuf =
    DecSumVecAgg.deserializeBuf(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): DecTermSumsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DecTermSumsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): DecTermSumsAgg =
    copy(child = newChildren.head)
}

object DecTermSumsAgg {
  /** N-slot exact decimal(prec,8) sums over a codegen'd `array<double>`
    * term column: slot i sums `cast(terms[i] as decimal(prec,8))` exactly. */
  def dec_term_sums(terms: Column, n: Int, prec: Int): Column = {
    SessionTuning.ensureActiveSession()
    Bridge.column(
      DecTermSumsAgg(Bridge.expression(terms), n, prec).toAggregateExpression())
  }
}

object DecSumVecAgg {
  private[functions] def serializeBuf(buf: DecSumBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeInt(buf.dim)
    o.writeLong(buf.count)
    var j = 0
    while (j < buf.dim) {
      o.writeBoolean(buf.seen(j))
      val bytes = buf.unscaledAt(j).toByteArray
      o.writeInt(bytes.length)
      o.write(bytes)
      j += 1
    }
    o.flush()
    bos.toByteArray
  }

  private[functions] def deserializeBuf(bytes: Array[Byte]): DecSumBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = in.readInt()
    val buf = new DecSumBuf(d)
    buf.count = in.readLong()
    var j = 0
    while (j < d) {
      val s = in.readBoolean()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      if (s) buf.add(j, new java.math.BigInteger(b))
      j += 1
    }
    buf
  }

  /** Per-dim exact decimal(28,8) sums of an array<float> column: mean pass
    * (`w = null`, terms `cast(v[j] as decimal(28,8))`) or centered matvec
    * pass (terms `cast((v[j]−mean_j)·((v−mean)·w) as decimal(28,8))`).
    * One ObjectHashAggregate buffer instead of dim independent sums. */
  def dec_sum_vec(vec: Column, dim: Int, mean: Array[Double],
                  w: Array[Double]): Column = {
    SessionTuning.ensureActiveSession()
    Bridge.column(
      DecSumVecAgg(Bridge.expression(vec), dim, mean, w).toAggregateExpression())
  }
}
