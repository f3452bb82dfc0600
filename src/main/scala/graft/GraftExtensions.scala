package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension entry point: registers the engine's native
  * expressions into any session built with
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * }}}
  *
  * (or `.withExtensions(new GraftExtensions)`), so `vec_cosine` is
  * available from SQL text cluster-wide without per-session imperative
  * registration. No optimizer rules or planner strategies are injected —
  * Catalyst's built-ins cover this engine's plans (SURVEY.md §4.2); the
  * extension surface is deliberately just functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        new FunctionIdentifier("vec_cosine"),
        new ExpressionInfo(
          classOf[functions.FloatVecCosine].getCanonicalName,
          "vec_cosine"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          functions.FloatVecCosine(exprs(0), exprs(1)),
      )
    )
  }
}
