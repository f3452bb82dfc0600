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
  import org.apache.spark.sql.catalyst.expressions.Expression

  private def inject(
      ext: SparkSessionExtensions,
      name: String,
      clazz: Class[_],
      builder: Seq[Expression] => Expression,
  ): Unit =
    ext.injectFunction(
      (new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getCanonicalName, name), builder))

  override def apply(ext: SparkSessionExtensions): Unit = {
    inject(ext, "vec_cosine", classOf[functions.FloatVecCosine],
      exprs => functions.FloatVecCosine(exprs(0), exprs(1)))
    inject(ext, "simhash64", classOf[functions.SimHash64],
      exprs => functions.SimHash64(exprs(0)))
    inject(ext, "text_shingle_hashes", classOf[functions.WordShingleHashes],
      exprs => {
        require(exprs.length == 2 && exprs(1).foldable,
          "text_shingle_hashes(text, w): w must be a literal")
        functions.WordShingleHashes(exprs(0),
          functions.FoldableArg.positiveInt(exprs(1), "text_shingle_hashes w"))
      })
    inject(ext, "minhash_sig", classOf[functions.MinHashSignature],
      exprs => {
        require(exprs.length == 2 && exprs(1).foldable,
          "minhash_sig(shingles, numHashes): numHashes must be a literal")
        functions.MinHashSignature(exprs(0),
          functions.FoldableArg.positiveInt(exprs(1), "minhash_sig numHashes"))
      })
    inject(ext, "gear_chunks", classOf[functions.GearChunksExpr],
      exprs => {
        require(exprs.length == 4 && exprs.drop(1).forall(_.foldable),
          "gear_chunks(text, minSz, mask, maxSz): sizes must be literals")
        functions.GearChunksExpr(
          exprs(0),
          functions.FoldableArg.positiveInt(exprs(1), "gear_chunks minSz"),
          functions.FoldableArg.positiveLong(exprs(2), "gear_chunks mask"),
          functions.FoldableArg.positiveInt(exprs(3), "gear_chunks maxSz"))
      })
    inject(ext, "gorilla_encode", classOf[functions.GorillaEncode],
      exprs => {
        require(exprs.length == 2, "gorilla_encode(ts, vals)")
        functions.GorillaEncode(exprs(0), exprs(1))
      })
    inject(ext, "gorilla_decode", classOf[functions.GorillaDecode],
      exprs => {
        require(exprs.length == 1, "gorilla_decode(bin)")
        functions.GorillaDecode(exprs(0))
      })
  }
}
