package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression for float-vector cosine similarity.
  *
  * The composable path (`ops.Vectors.cosine`: zip_with + aggregate) is
  * correct but materializes intermediate arrays per row; this expression
  * is a single fused primitive loop with full whole-stage codegen — the
  * (b)-tier of the custom-operator preference order (compose built-ins >
  * custom Expression > custom operator > mapPartitions). Accumulation is
  * double, left-to-right, matching both the HOF path and the DuckDB
  * oracle formulation.
  */
case class FloatVecCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_cosine expects ARRAY<FLOAT>, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na  = 0.0
    var nb  = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode,
  ): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i   = ctx.freshName("i")
      val n   = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na  = ctx.freshName("na")
      val nb  = ctx.freshName("nb")
      val xv  = ctx.freshName("xv")
      val yv  = ctx.freshName("yv")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression,
  ): Expression = copy(left = newLeft, right = newRight)
}

/** Sign-LSH bucket key over a float vector with a PRECOMPUTED ±1
  * hyperplane matrix (flat, row-major: `signs(bit * dims + dim)`).
  *
  * The composable formulation re-derived each hyperplane component with
  * `xxhash64(table, bit, dim)` per row — 2048 row-invariant hash calls
  * per row at 8 bits × 4 tables × 64 dims. The matrix depends only on
  * (table, bit, dim), so it is evaluated once at plan-build time and
  * shipped as a codegen reference object; the per-row work collapses to
  * one fused multiply-add loop. Bit b is set iff the signed projection
  * is strictly positive, accumulated left-to-right in double — exactly
  * the semantics (and bit patterns) of the original HOF form.
  */
case class FloatVecLshBits(
    child: Expression,
    signs: Seq[Double],
    nBits: Int,
    dims: Int,
) extends UnaryExpression {

  // Seq (not Array) in the constructor so case-class equality is
  // element-wise: two identically-built kernels canonicalize equal and
  // stay eligible for subexpression elimination / exchange reuse. The
  // hot loops index a plain array.
  @transient private lazy val signsArr: Array[Double] = signs.toArray

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"vec_lsh_bits expects ARRAY<FLOAT>, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dims)
    var key = 0L
    var b = 0
    while (b < nBits) {
      var s = 0.0
      val off = b * dims
      var d = 0
      while (d < n) {
        s += x.getFloat(d).toDouble * signsArr(off + d)
        d += 1
      }
      if (s > 0) key |= (1L << b)
      b += 1
    }
    key
  }

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode,
  ): ExprCode = {
    val mat = ctx.addReferenceObj("lshSigns", signsArr, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n   = ctx.freshName("n")
      val b   = ctx.freshName("b")
      val d   = ctx.freshName("d")
      val s   = ctx.freshName("s")
      val off = ctx.freshName("off")
      s"""
         |int $n = Math.min($a.numElements(), $dims);
         |${ev.value} = 0L;
         |for (int $b = 0; $b < $nBits; $b++) {
         |  double $s = 0.0;
         |  int $off = $b * $dims;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $s += (double) $a.getFloat($d) * $mat[$off + $d];
         |  }
         |  if ($s > 0) ${ev.value} |= (1L << $b);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Shared primitive loops for the vector expressions (serializable —
  * codegen ships it as a reference object).
  */
object VectorKernels extends Serializable {

  /** Indices of the `nProbe` centroids with the largest dot product
    * against `v` (descending; ties broken by lower cell id). Centroids
    * are flat row-major `cents(cell * dims + d)` and L2-normalized, so
    * argmax-dot ≡ argmax-cosine for any input norm.
    */
  def topCells(
      v: ArrayData,
      cents: Array[Double],
      nCells: Int,
      dims: Int,
      nProbe: Int,
  ): ArrayData = {
    val n = math.min(v.numElements(), dims)
    val bestIdx = new Array[Int](nProbe)
    val bestDot = new Array[Double](nProbe)
    java.util.Arrays.fill(bestDot, Double.NegativeInfinity)
    var c = 0
    while (c < nCells) {
      var dot = 0.0
      val off = c * dims
      var d = 0
      while (d < n) {
        dot += v.getFloat(d).toDouble * cents(off + d)
        d += 1
      }
      // insertion into the running top-nProbe (descending)
      var i = nProbe - 1
      if (dot > bestDot(i)) {
        while (i > 0 && dot > bestDot(i - 1)) {
          bestDot(i) = bestDot(i - 1); bestIdx(i) = bestIdx(i - 1)
          i -= 1
        }
        bestDot(i) = dot; bestIdx(i) = c
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      bestIdx.take(math.min(nProbe, nCells)))
  }
}

/** `vec_top_cells(emb)` — see [[VectorKernels.topCells]]; the IVF
  * coarse-quantizer assignment/probe primitive. The centroid matrix is a
  * plan-build-time constant shipped as a codegen reference object, same
  * principle as [[FloatVecLshBits]].
  */
case class FloatVecTopCells(
    child: Expression,
    cents: Seq[Double],
    nCells: Int,
    dims: Int,
    nProbe: Int,
) extends UnaryExpression {

  // Seq for element-wise case-class equality (see FloatVecLshBits).
  @transient private lazy val centsArr: Array[Double] = cents.toArray

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"vec_top_cells expects ARRAY<FLOAT>, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any =
    VectorKernels.topCells(
      a.asInstanceOf[ArrayData], centsArr, nCells, dims, nProbe)

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode,
  ): ExprCode = {
    val kern = ctx.addReferenceObj("vecKernels", VectorKernels,
      VectorKernels.getClass.getName)
    val mat = ctx.addReferenceObj("ivfCents", centsArr, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $kern.topCells($a, $mat, $nCells, $dims, $nProbe);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object VectorExprs {

  private val fnName = "vec_cosine"

  /** Register `vec_cosine` in the session's function registry (idempotent)
    * so it is reachable from both the Column API and SQL text.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName,
      exprs => FloatVecCosine(exprs(0), exprs(1)),
      "built-in",
    )

  /** Column-API handle (requires `register(spark)` once per session). */
  def vecCosine(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(fnName, a, b)
  }

  private val lshFnName = "vec_lsh_bits"

  /** Register `vec_lsh_bits`. The sign matrix / nBits / dims arguments
    * must be foldable (literals): they are evaluated once at plan-build
    * time and baked into the expression as constants.
    */
  def registerLsh(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      lshFnName,
      exprs => {
        require(exprs.drop(1).forall(_.foldable),
          "vec_lsh_bits(emb, signs, nBits, dims): signs/nBits/dims must be literals")
        val signs = exprs(1).eval(null).asInstanceOf[ArrayData].toDoubleArray()
        val nBits = FoldableArg.positiveInt(exprs(2), "vec_lsh_bits nBits")
        val dims  = FoldableArg.positiveInt(exprs(3), "vec_lsh_bits dims")
        require(signs.length == nBits * dims,
          s"sign matrix length ${signs.length} != nBits*dims ${nBits * dims}")
        FloatVecLshBits(exprs(0),
          scala.collection.immutable.ArraySeq.unsafeWrapArray(signs),
          nBits, dims)
      },
      "built-in",
    )

  private val topCellsFnName = "vec_top_cells"

  /** Register `vec_top_cells`. Non-vector arguments must be foldable —
    * evaluated once at plan-build time, baked in as constants.
    */
  def registerTopCells(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      topCellsFnName,
      exprs => {
        require(exprs.drop(1).forall(_.foldable),
          "vec_top_cells(emb, cents, nCells, dims, nProbe): " +
            "cents/nCells/dims/nProbe must be literals")
        val cents = exprs(1).eval(null).asInstanceOf[ArrayData].toDoubleArray()
        val nCells = FoldableArg.positiveInt(exprs(2), "vec_top_cells nCells")
        val dims   = FoldableArg.positiveInt(exprs(3), "vec_top_cells dims")
        val nProbe = FoldableArg.positiveInt(exprs(4), "vec_top_cells nProbe")
        require(cents.length == nCells * dims,
          s"centroid matrix length ${cents.length} != nCells*dims ${nCells * dims}")
        FloatVecTopCells(exprs(0),
          scala.collection.immutable.ArraySeq.unsafeWrapArray(cents),
          nCells, dims, nProbe)
      },
      "built-in",
    )

  /** Column-API handle for the IVF top-cells probe. */
  def vecTopCells(
      spark: SparkSession,
      emb: Column,
      cents: Array[Double],
      nCells: Int,
      dims: Int,
      nProbe: Int,
  ): Column = {
    registerTopCells(spark)
    import org.apache.spark.sql.functions.{call_function, lit, typedLit}
    call_function(topCellsFnName, emb, typedLit(cents.toSeq),
      lit(nCells), lit(dims), lit(nProbe))
  }

  /** Column-API handle for the precomputed-hyperplane LSH key. */
  def vecLshBits(
      spark: SparkSession,
      emb: Column,
      signs: Array[Double],
      nBits: Int,
      dims: Int,
  ): Column = {
    registerLsh(spark)
    import org.apache.spark.sql.functions.{call_function, lit, typedLit}
    call_function(lshFnName, emb, typedLit(signs.toSeq), lit(nBits), lit(dims))
  }
}
