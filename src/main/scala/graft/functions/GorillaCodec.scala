package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Gorilla-style time-series compression (Pelkonen et al., VLDB 2015 —
  * the public Facebook in-memory TSDB paper) as paired codegen kernels:
  * timestamps are delta-of-delta bit-packed (regular cadence costs ONE
  * BIT per point), values are XOR-packed against their predecessor
  * (repeated values cost one bit; slowly-moving doubles store only the
  * meaningful XOR window). This is the storage-engine layer under the
  * engine's event analytics: at 100 TB of telemetry the (ts, value)
  * stream is the dominant byte mass, and 16 bytes/point raw compresses
  * to ~1-2 bits/point on machine-generated cadences.
  *
  * Wire format (per series): i32 count, then for n ≥ 1: i64 ts₀,
  * i64 bits(v₀); for n ≥ 2: i64 first delta; then per point:
  * delta-of-delta D as {'0'} | {'10' + 7b} | {'110' + 10b} |
  * {'1110' + 13b} | {'1111' + 64b} (two's-complement windows −64..63,
  * −512..511, −4096..4095), and XOR x as {'0'} | {'10' + reuse window}
  * | {'11' + 5b leading-zero count (capped 31) + 6b meaningful-length−1
  * + bits}. Decode inverts exactly; Round18bSpec gates
  * decode ∘ encode ≡ identity over the full driver events table and
  * adversarial fixtures (constants, sign flips, NaN/Inf bit patterns,
  * ragged gaps).
  */
object GorillaCodec extends Serializable {

  private final class BitWriter(sizeHint: Int) {
    private var buf = new Array[Byte](math.max(sizeHint, 16))
    private var bitLen = 0
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        val byteIdx = bitLen >> 3
        if (byteIdx >= buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
        if (((v >>> i) & 1L) != 0L)
          buf(byteIdx) = (buf(byteIdx) | (1 << (7 - (bitLen & 7)))).toByte
        bitLen += 1
        i -= 1
      }
    }
    def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, (bitLen + 7) >> 3)
  }

  private final class BitReader(bytes: Array[Byte]) {
    private var pos = 0
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        val bit = (bytes(pos >> 3) >> (7 - (pos & 7))) & 1
        v = (v << 1) | bit
        pos += 1
        i += 1
      }
      v
    }
    /** Sign-extend an `n`-bit two's-complement window. */
    def readSigned(n: Int): Long = {
      val raw = readBits(n)
      (raw << (64 - n)) >> (64 - n)
    }
  }

  def encode(ts: ArrayData, vs: ArrayData): Array[Byte] = {
    val n = ts.numElements()
    require(vs.numElements() == n, "gorilla_encode: ragged arrays")
    // a null element read through UnsafeArrayData.getLong/getDouble
    // silently yields 0/0.0 — that would be a CORRUPT blob with no
    // error (r18 advice), so reject nulls loudly here (the type check
    // can't: SQL callers arrive as ArrayType(..., containsNull=true))
    var k = 0
    while (k < n) {
      require(!ts.isNullAt(k) && !vs.isNullAt(k),
        s"gorilla_encode: null element at index $k — nulls are not " +
          "encodable; filter or impute before encoding")
      k += 1
    }
    val w = new BitWriter(8 + n * 2)
    w.writeBits(n.toLong & 0xffffffffL, 32)
    if (n == 0) return w.toBytes
    var prevTs = ts.getLong(0)
    var prevBits = java.lang.Double.doubleToRawLongBits(vs.getDouble(0))
    w.writeBits(prevTs, 64)
    w.writeBits(prevBits, 64)
    var prevDelta = 0L
    var prevLz = -1
    var prevTz = -1
    var i = 1
    while (i < n) {
      val t = ts.getLong(i)
      val delta = t - prevTs
      if (i == 1) {
        w.writeBits(delta, 64)
      } else {
        val dd = delta - prevDelta
        if (dd == 0L) w.writeBits(0L, 1)
        else if (dd >= -64 && dd <= 63) { w.writeBits(2L, 2); w.writeBits(dd & 0x7fL, 7) }
        else if (dd >= -512 && dd <= 511) { w.writeBits(6L, 3); w.writeBits(dd & 0x3ffL, 10) }
        else if (dd >= -4096 && dd <= 4095) { w.writeBits(14L, 4); w.writeBits(dd & 0x1fffL, 13) }
        else { w.writeBits(15L, 4); w.writeBits(dd, 64) }
      }
      prevDelta = delta
      prevTs = t
      val bits = java.lang.Double.doubleToRawLongBits(vs.getDouble(i))
      val x = bits ^ prevBits
      if (x == 0L) w.writeBits(0L, 1)
      else {
        val lz = math.min(java.lang.Long.numberOfLeadingZeros(x), 31)
        val tz = java.lang.Long.numberOfTrailingZeros(x)
        if (prevLz >= 0 && lz >= prevLz && tz >= prevTz) {
          val len = 64 - prevLz - prevTz
          w.writeBits(2L, 2)
          w.writeBits(x >>> prevTz, len)
        } else {
          val len = 64 - lz - tz
          w.writeBits(3L, 2)
          w.writeBits(lz.toLong, 5)
          w.writeBits((len - 1).toLong, 6)
          w.writeBits(x >>> tz, len)
          prevLz = lz
          prevTz = tz
        }
      }
      prevBits = bits
      i += 1
    }
    w.toBytes
  }

  def decode(bytes: Array[Byte]): InternalRow = {
    val r = new BitReader(bytes)
    val n = r.readBits(32).toInt
    val ts = new Array[Long](n)
    val vs = new Array[Double](n)
    if (n > 0) {
      ts(0) = r.readBits(64)
      var prevBits = r.readBits(64)
      vs(0) = java.lang.Double.longBitsToDouble(prevBits)
      var prevDelta = 0L
      var prevLz = -1
      var prevTz = -1
      var i = 1
      while (i < n) {
        val delta =
          if (i == 1) r.readBits(64)
          else {
            val dd =
              if (r.readBits(1) == 0L) 0L
              else if (r.readBits(1) == 0L) r.readSigned(7)
              else if (r.readBits(1) == 0L) r.readSigned(10)
              else if (r.readBits(1) == 0L) r.readSigned(13)
              else r.readBits(64)
            prevDelta + dd
          }
        ts(i) = ts(i - 1) + delta
        prevDelta = delta
        if (r.readBits(1) == 0L) {
          vs(i) = java.lang.Double.longBitsToDouble(prevBits)
        } else {
          val x =
            if (r.readBits(1) == 0L) {
              val len = 64 - prevLz - prevTz
              r.readBits(len) << prevTz
            } else {
              val lz = r.readBits(5).toInt
              val len = r.readBits(6).toInt + 1
              val tz = 64 - lz - len
              prevLz = lz
              prevTz = tz
              r.readBits(len) << tz
            }
          prevBits = prevBits ^ x
          vs(i) = java.lang.Double.longBitsToDouble(prevBits)
        }
        i += 1
      }
    }
    InternalRow(new GenericArrayData(ts), new GenericArrayData(vs))
  }
}

/** `gorilla_encode(ts_array, val_array)` — see [[GorillaCodec.encode]]. */
case class GorillaEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gorilla_encode expects (ARRAY<LONG>, ARRAY<DOUBLE>), got $other")
    }

  override def nullSafeEval(t: Any, v: Any): Any =
    GorillaCodec.encode(t.asInstanceOf[ArrayData], v.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("gorilla", GorillaCodec,
      GorillaCodec.getClass.getName)
    nullSafeCodeGen(ctx, ev, (t, v) => s"${ev.value} = $obj.encode($t, $v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `gorilla_decode(binary)` — see [[GorillaCodec.decode]]. */
case class GorillaDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("ts", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("vs", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gorilla_decode expects BINARY, got ${other.simpleString}")
    }

  override def nullSafeEval(b: Any): Any =
    GorillaCodec.decode(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("gorilla", GorillaCodec,
      GorillaCodec.getClass.getName)
    nullSafeCodeGen(ctx, ev, b => s"${ev.value} = $obj.decode($b);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object Gorilla {

  /** Register both codec kernels in the session registry (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "gorilla_encode",
      exprs => {
        require(exprs.length == 2, "gorilla_encode(ts, vals)")
        GorillaEncode(exprs(0), exprs(1))
      },
      "built-in")
    reg.createOrReplaceTempFunction(
      "gorilla_decode",
      exprs => {
        require(exprs.length == 1, "gorilla_decode(bin)")
        GorillaDecode(exprs(0))
      },
      "built-in")
  }

  def encode(spark: SparkSession, ts: Column, vs: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("gorilla_encode", ts, vs)
  }

  def decode(spark: SparkSession, bin: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("gorilla_decode", bin)
  }
}
