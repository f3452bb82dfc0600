package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-subsequence length over two token arrays — the core
  * of ROUGE-L (and of diff-style alignment generally). The classic
  * O(n·m) two-row DP in one tight JVM loop per pair; token identity is
  * UTF8String equality. No SQL twin: the within-row left-to-right DP
  * dependency has no practical relational form, so q352 is spec-gated
  * against an independent reference DP (Round18bSpec) instead of a
  * DuckDB oracle.
  */
object Lcs extends Serializable {

  def lcsLen(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return 0
    val as = new Array[UTF8String](n)
    var i = 0
    while (i < n) { as(i) = a.getUTF8String(i); i += 1 }
    val bs = new Array[UTF8String](m)
    var j = 0
    while (j < m) { bs(j) = b.getUTF8String(j); j += 1 }
    var prev = new Array[Int](m + 1)
    var cur  = new Array[Int](m + 1)
    i = 0
    while (i < n) {
      j = 0
      while (j < m) {
        cur(j + 1) =
          if (as(i).equals(bs(j))) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    prev(m)
  }
}

/** `lcs_len(tokens_a, tokens_b)` — see [[Lcs.lcsLen]]. */
case class LcsLen(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"lcs_len expects (ARRAY<STRING>, ARRAY<STRING>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    Lcs.lcsLen(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("lcs", Lcs, Lcs.getClass.getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $obj.lcsLen($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LcsExprs {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lcs_len",
      exprs => {
        require(exprs.length == 2, "lcs_len(a, b)")
        LcsLen(exprs(0), exprs(1))
      },
      "built-in")

  def lcsLen(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("lcs_len", a, b)
  }
}
