package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (gear-hash CDC) — one-pass primitive kernel.
  *
  * Fixed-width chunking breaks under INSERTION: one added byte shifts
  * every later boundary, so a near-identical document shares almost no
  * chunks with its original. Gear CDC (the rolling-hash family behind
  * FastCDC/restic/LBFS-style dedup) cuts where a rolling hash of the
  * recent byte window masks to zero — boundaries are a function of LOCAL
  * CONTENT, so after any prefix edit the boundaries re-synchronize within
  * ~one chunk and the rest of the document deduplicates again. This is
  * byte-grain dedup below the document/passage grain of the MinHash /
  * passage-hash families (`ops/Dedup.scala`, `ops/Text.scala`).
  *
  * Algorithm (public, from the FastCDC paper's gear construction):
  * `h = (h << 1) + GEAR[byte]`; cut after byte i when the chunk is at
  * least `minSz` long and `(h & mask) == 0` (expected length ≈
  * minSz + 2^popcount(mask)), or unconditionally at `maxSz`; the hash
  * resets per chunk. GEAR is the splitmix64 image of the byte value —
  * a published, seedless, reproducible table (no magic constants beyond
  * splitmix64's). Chunk identity is FNV-1a 64 over the chunk's UTF-8
  * bytes.
  *
  * The kernel returns `array<struct<ch: long, clen: int>>` per document
  * in one tight JVM loop (same single-pass discipline as
  * [[TextHash.shingleHashes]]); Round18bSpec locks it against an
  * independent reference walk, the length bounds, the reassembly
  * invariant, and the prefix-edit re-synchronization property that is
  * the operator's entire point.
  */
object GearCdc extends Serializable {

  /** splitmix64 finalizer — the same public mixing function the
    * generator's counter-based RNG uses (`gen/Rng.scala`).
    */
  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** GEAR[b] = splitmix64(b) for b in 0..255. */
  val GEAR: Array[Long] = Array.tabulate(256)(b => splitmix64(b.toLong))

  private val FNV_OFFSET = 0xcbf29ce484222325L
  private val FNV_PRIME  = 0x100000001b3L

  /** (FNV-1a 64 hash, length) of each content-defined chunk of `text`'s
    * UTF-8 bytes. The tail chunk may be shorter than `minSz`.
    */
  def chunks(
      text: UTF8String, minSz: Int, mask: Long, maxSz: Int): ArrayData = {
    val bytes = text.getBytes
    val n     = bytes.length
    val out   = new java.util.ArrayList[InternalRow](n / minSz + 1)
    var start = 0
    var h     = 0L
    var i     = 0
    while (i < n) {
      h = (h << 1) + GEAR(bytes(i) & 0xff)
      val len = i - start + 1
      if ((len >= minSz && (h & mask) == 0L) || len == maxSz) {
        out.add(InternalRow(fnv1a(bytes, start, i + 1), len))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < n)
      out.add(InternalRow(fnv1a(bytes, start, n), n - start))
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size)))
  }

  private def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = FNV_OFFSET
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= FNV_PRIME
      i += 1
    }
    h
  }
}

/** `gear_chunks(text, minSz, mask, maxSz)` — see [[GearCdc.chunks]]. */
case class GearChunksExpr(child: Expression, minSz: Int, mask: Long, maxSz: Int)
    extends UnaryExpression {

  require(minSz >= 1 && maxSz >= minSz, "gear_chunks: need 1 <= minSz <= maxSz")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ch", LongType, nullable = false),
      StructField("clen", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gear_chunks expects STRING, got ${other.simpleString}")
    }

  override def nullSafeEval(t: Any): Any =
    GearCdc.chunks(t.asInstanceOf[UTF8String], minSz, mask, maxSz)

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode,
  ): ExprCode = {
    val obj = ctx.addReferenceObj("gearCdc", GearCdc, GearCdc.getClass.getName)
    nullSafeCodeGen(ctx, ev,
      t => s"${ev.value} = $obj.chunks($t, $minSz, ${mask}L, $maxSz);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object GearChunks {

  /** Register `gear_chunks` in the session registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gear_chunks",
      exprs => {
        require(exprs.length == 4 && exprs.drop(1).forall(_.foldable),
          "gear_chunks(text, minSz, mask, maxSz): sizes must be literals")
        GearChunksExpr(
          exprs(0),
          FoldableArg.positiveInt(exprs(1), "gear_chunks minSz"),
          FoldableArg.positiveLong(exprs(2), "gear_chunks mask"),
          FoldableArg.positiveInt(exprs(3), "gear_chunks maxSz"))
      },
      "built-in",
    )

  def gearChunks(
      spark: SparkSession, text: Column,
      minSz: Int, mask: Long, maxSz: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "gear_chunks", text,
      org.apache.spark.sql.functions.lit(minSz),
      org.apache.spark.sql.functions.lit(mask),
      org.apache.spark.sql.functions.lit(maxSz))
  }
}
