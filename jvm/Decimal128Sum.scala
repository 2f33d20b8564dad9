/*
 * Exact decimal sum on a two-long (int128) accumulator, fully inside
 * whole-stage codegen.
 *
 * Why: the engine's float-exactness contract (functions/exact.py) routes
 * every order-independent sum through DECIMAL(28,6) so Spark and the
 * DuckDB oracle hash-match on any partitioning. Spark's built-in
 * sum(decimal(p>18)) pays, per row: a scala BigDecimal add (the compact
 * long fast path in Decimal.$plus never fires because a double->decimal
 * cast is BigDecimal-backed and changePrecision never re-compacts), a
 * CheckOverflow toPrecision clone, and an UnsafeRow setDecimal write
 * (BigInteger.toByteArray). Measured on the 600k-row sf0.1 lineitem:
 * ~0.25 s per aggregate vs ~0.05 s for a long sum (guide section 2.3,
 * "narrower types").
 *
 * This DeclarativeAggregate keeps the exact unscaled value in two long
 * buffer slots (a signed int128) plus a valid-row count. All arithmetic
 * happens inside static helper calls (StaticInvoke), so the intended
 * two's-complement carries never meet ANSI Add semantics, and the whole
 * update stays in HashAggregate whole-stage codegen (never
 * ObjectHashAggregate -- the round-12 TypedImperativeAggregate trap).
 *
 * Exactness: the per-row conversion calls Spark's own Decimal methods
 * (JBigDecimal.valueOf -> Decimal -> toPrecision HALF_UP), i.e. the
 * literal code path of Cast(double -> decimal(p,s)), so the summed terms
 * are bit-identical to the built-in form's by construction:
 *   - NaN / Infinity -> NumberFormatException -> row skipped (the cast
 *     yields NULL even under ANSI; sum skips NULLs),
 *   - |rounded| >= 10^p -> ANSI: SparkArithmeticException (same
 *     toPrecision call the cast makes); non-ANSI: NULL -> row skipped.
 * The int128 accumulator is exact up to |unscaled| < 2^127 ~ 1.7e38,
 * wider than the decimal(38,s) result domain (10^38); any signed-128
 * overflow in update/merge throws ArithmeticException rather than wrap
 * (the built-in sum at those magnitudes has already errored under ANSI
 * or null-poisoned the sum under non-ANSI; we fail loud in both modes).
 *
 * evaluate() rebuilds the BigDecimal once per GROUP, not per row, and
 * applies the same toPrecision(38,s) bound check the built-in sum's
 * CheckOverflow applies.
 */
package ipydataclean.spark.fastagg

import java.math.{BigDecimal => JBigDecimal, BigInteger}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

object D128 {

  /** Per-thread memo: the three update expressions of one aggregate (and
    * sibling aggregates over the same child) each convert the same double
    * in one row; key on (value, scale, precision) so the string-parse and
    * BigDecimal work happen once per distinct consecutive input. Executor
    * task threads are independent, so a plain ThreadLocal is race-free.
    */
  final class Memo {
    var key: Double = 0.0
    var prec: Int = -1
    var scl: Int = -1
    var has: Boolean = false
    var valid: Boolean = false
    var hi: Long = 0L
    var lo: Long = 0L
  }

  private val tl: ThreadLocal[Memo] = new ThreadLocal[Memo] {
    override def initialValue(): Memo = new Memo
  }

  /** Exactly Cast(double -> decimal(prec,scl)): JBigDecimal.valueOf (the
    * Double.toString shortest-representation route Spark's codegen
    * emits), Decimal wrap, toPrecision HALF_UP with ANSI-aware overflow.
    * Invalid (NaN/Inf always; out-of-range under non-ANSI) -> valid=false.
    */
  private def convD(x: Double, prec: Int, scl: Int): Memo = {
    val m = tl.get()
    if (!m.has || m.key != x || m.prec != prec || m.scl != scl) {
      m.key = x
      m.prec = prec
      m.scl = scl
      m.has = true
      m.valid = false; m.hi = 0L; m.lo = 0L
      try {
        // The literal operation sequence of Decimal.changePrecision on a
        // BigDecimal-backed value (what the cast runs): setScale(scl,
        // HALF_UP), then a precision bound check -- minus the scala
        // wrapper and BigInteger allocations on the compact path.
        val s = JBigDecimal.valueOf(x) // Double.toString route; NFE on NaN/Inf
          .setScale(scl, java.math.RoundingMode.HALF_UP)
        if (s.precision() > prec) {
          if (SQLConf.get.ansiEnabled) {
            throw new ArithmeticException(
              s"$x cannot be represented as Decimal($prec, $scl) (decimal128_sum input)")
          } // else: cast yields NULL, row skipped
        } else {
          try {
            val u = s.scaleByPowerOfTen(scl).longValueExact() // compact, no BigInteger
            m.valid = true; m.lo = u; m.hi = u >> 63 // sign extension
          } catch {
            case _: ArithmeticException => // |unscaled| >= 2^63: full 128-bit extract
              val bi = s.unscaledValue()
              m.valid = true
              m.lo = bi.longValue()
              m.hi = bi.shiftRight(64).longValue()
          }
        }
      } catch {
        case _: NumberFormatException => // NaN / Infinity: cast -> NULL
      }
    }
    m
  }

  /** int128 add: (hi1,lo1) + (hi2,lo2), throwing on signed-128 overflow. */
  @inline private def addHi128(hi1: Long, lo1: Long, hi2: Long, lo2: Long): Long = {
    val nl = lo1 + lo2
    val carry = ((lo1 & lo2) | ((lo1 | lo2) & ~nl)) >>> 63
    val nh = hi1 + hi2 + carry
    // signed overflow of the 128-bit value: operand signs equal, result sign differs
    if (((hi1 ^ nh) & (hi2 ^ nh)) < 0) {
      throw new ArithmeticException(
        "Decimal128Sum accumulator overflow (|unscaled sum| >= 2^127)")
    }
    nh
  }

  // ---- double child ----
  def updHiD(hi: Long, lo: Long, x: Double, prec: Int, scl: Int): Long = {
    val m = convD(x, prec, scl)
    if (m.valid) addHi128(hi, lo, m.hi, m.lo) else hi
  }
  def updLoD(lo: Long, x: Double, prec: Int, scl: Int): Long = {
    val m = convD(x, prec, scl)
    if (m.valid) lo + m.lo else lo
  }
  def updCntD(cnt: Long, x: Double, prec: Int, scl: Int): Long = {
    val m = convD(x, prec, scl)
    if (m.valid) cnt + 1L else cnt
  }

  // ---- float child (Spark casts float via toDouble, then the double path) ----
  def updHiF(hi: Long, lo: Long, x: Float, prec: Int, scl: Int): Long =
    updHiD(hi, lo, x.toDouble, prec, scl)
  def updLoF(lo: Long, x: Float, prec: Int, scl: Int): Long =
    updLoD(lo, x.toDouble, prec, scl)
  def updCntF(cnt: Long, x: Float, prec: Int, scl: Int): Long =
    updCntD(cnt, x.toDouble, prec, scl)

  // ---- integral child: unscaled = i * 10^scl, exact in int128, never
  // out of decimal(p>=19+scl,scl) range for any long ----
  private val POW10: Array[Long] = {
    val a = new Array[Long](19)
    a(0) = 1L
    var i = 1
    while (i < 19) { a(i) = a(i - 1) * 10L; i += 1 }
    a
  }
  def updHiL(hi: Long, lo: Long, i: Long, prec: Int, scl: Int): Long = {
    val p = POW10(scl)
    addHi128(hi, lo, Math.multiplyHigh(i, p), i * p)
  }
  def updLoL(lo: Long, i: Long, prec: Int, scl: Int): Long = lo + i * POW10(scl)
  def updCntL(cnt: Long, i: Long, prec: Int, scl: Int): Long = cnt + 1L

  // ---- decimal child: same toPrecision rescale the cast performs ----
  private def convDec(d: Decimal, prec: Int, scl: Int): BigInteger = {
    val c = d.toJavaBigDecimal // copy: never mutate the incoming Decimal
    val r = Decimal(c)
    if (r.changePrecision(prec, scl)) r.toJavaBigDecimal.unscaledValue()
    else if (SQLConf.get.ansiEnabled) {
      throw new ArithmeticException(
        s"$d cannot be represented as Decimal($prec, $scl) (decimal128_sum input)")
    } else null
  }
  def updHiDec(hi: Long, lo: Long, d: Decimal, prec: Int, scl: Int): Long = {
    val bi = convDec(d, prec, scl)
    if (bi == null) hi
    else addHi128(hi, lo, bi.shiftRight(64).longValue(), bi.longValue())
  }
  def updLoDec(lo: Long, d: Decimal, prec: Int, scl: Int): Long = {
    val bi = convDec(d, prec, scl)
    if (bi == null) lo else lo + bi.longValue()
  }
  def updCntDec(cnt: Long, d: Decimal, prec: Int, scl: Int): Long =
    if (convDec(d, prec, scl) == null) cnt else cnt + 1L

  // ---- merge ----
  def mergeHi(hi1: Long, lo1: Long, hi2: Long, lo2: Long): Long =
    addHi128(hi1, lo1, hi2, lo2)
  def mergeLo(lo1: Long, lo2: Long): Long = lo1 + lo2
  def addCnt(a: Long, b: Long): Long = a + b

  // ---- evaluate: once per group ----
  def toDec(hi: Long, lo: Long, prec: Int, scl: Int): Decimal = {
    val b = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      b(i) = (hi >>> (56 - 8 * i)).toByte
      b(i + 8) = (lo >>> (56 - 8 * i)).toByte
      i += 1
    }
    val bi = new BigInteger(b)
    val r = Decimal(new JBigDecimal(bi, scl))
    // same bound check the built-in sum's CheckOverflow applies
    if (r.changePrecision(prec, scl)) r
    else if (SQLConf.get.ansiEnabled) {
      throw new ArithmeticException(
        s"sum value cannot be represented as Decimal($prec, $scl) (decimal128_sum)")
    } else null
  }
}

case class Decimal128Sum(child: Expression, precision: Int, scale: Int)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  def this(child: Expression) = this(child, 28, 6)

  override def prettyName: String = "decimal128_sum"

  /** Same widening the built-in Sum applies: sum(decimal(p,s)) has type
    * decimal(min(p+10, 38), s), so group totals may legally exceed the
    * input precision by up to 10 digits. */
  private val resultPrecision: Int = math.min(precision + 10, DecimalType.MAX_PRECISION)

  override def dataType: DataType = DecimalType(resultPrecision, scale)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"decimal128_sum requires a numeric child, got $other")
  }

  private lazy val hi = AttributeReference("d128hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("d128lo", LongType, nullable = false)()
  private lazy val cnt = AttributeReference("d128cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, cnt)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(0L))

  private def si(
      name: String,
      dt: DataType,
      args: Seq[Expression],
      resNullable: Boolean = false): Expression =
    StaticInvoke(
      D128.getClass, dt, name, args,
      Nil /* inputTypes: skip implicit coercion, types are exact */,
      false /* propagateNull: args are never null where this is reached */,
      resNullable, true /* deterministic */, None)

  private lazy val typedChild: Expression = child.dataType match {
    case ByteType | ShortType | IntegerType => Cast(child, LongType)
    case _ => child
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val suffix = child.dataType match {
      case DoubleType => "D"
      case FloatType => "F"
      case _: DecimalType => "Dec"
      case _ => "L"
    }
    val p = Literal(precision)
    val s = Literal(scale)
    val newHi = si("updHi" + suffix, LongType, Seq(hi, lo, typedChild, p, s))
    val newLo = si("updLo" + suffix, LongType, Seq(lo, typedChild, p, s))
    val newCnt = si("updCnt" + suffix, LongType, Seq(cnt, typedChild, p, s))
    Seq(
      If(IsNull(typedChild), hi, newHi),
      If(IsNull(typedChild), lo, newLo),
      If(IsNull(typedChild), cnt, newCnt))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    si("mergeHi", LongType, Seq(hi.left, lo.left, hi.right, lo.right)),
    si("mergeLo", LongType, Seq(lo.left, lo.right)),
    si("addCnt", LongType, Seq(cnt.left, cnt.right)))

  override lazy val evaluateExpression: Expression =
    If(
      EqualTo(cnt, Literal(0L)),
      Literal.create(null, dataType),
      si("toDec", dataType, Seq(hi, lo, Literal(resultPrecision), Literal(scale)),
        resNullable = true))

  override protected def withNewChildInternal(newChild: Expression): Decimal128Sum =
    copy(child = newChild)
}
