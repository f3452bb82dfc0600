package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression

/** Coercion for foldable integer arguments arriving from SQL text or the
  * Column API. A SQL literal may fold to Int, Long, Short, or Byte
  * depending on how the user wrote it (`32`, `CAST(32 AS BIGINT)`,
  * `32::SMALLINT`, …); a blind `asInstanceOf[Int]` throws an opaque
  * ClassCastException on anything but Int. Every caller sizes an array or
  * a band count from the value, so it must also be strictly positive —
  * rejecting here turns a NegativeArraySizeException at plan build into a
  * readable error at the call site.
  */
private[graft] object FoldableArg {

  def positiveInt(e: Expression, what: String): Int = {
    val v: Long = e.eval(null) match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long    => l.longValue()
      case s: java.lang.Short   => s.longValue()
      case b: java.lang.Byte    => b.longValue()
      case null =>
        throw new IllegalArgumentException(s"$what must not be NULL")
      case other =>
        throw new IllegalArgumentException(
          s"$what must be an integer literal, got " +
            s"$other (${other.getClass.getSimpleName})")
    }
    require(v > 0 && v <= Int.MaxValue,
      s"$what must be a positive 32-bit integer, got $v")
    v.toInt
  }

  def positiveLong(e: Expression, what: String): Long = {
    val v: Long = e.eval(null) match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long    => l.longValue()
      case s: java.lang.Short   => s.longValue()
      case b: java.lang.Byte    => b.longValue()
      case null =>
        throw new IllegalArgumentException(s"$what must not be NULL")
      case other =>
        throw new IllegalArgumentException(
          s"$what must be an integer literal, got " +
            s"$other (${other.getClass.getSimpleName})")
    }
    require(v > 0, s"$what must be a positive integer, got $v")
    v
  }
}
