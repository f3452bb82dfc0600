package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pattern set: `types[n][L]` event-type matrix + `gaps[n][L-1]` intervals
  * (≡ `PatternSet`, `eventstream.py:116-137`). Patterns are tiny by
  * construction (8×10 in the reference demo, `main.py:4-11`) so they are
  * generated on the driver and shipped to executors inside the generator
  * closure — the classic broadcast-dimension shape.
  */
final case class PatternSet(
    types: Array[Array[Int]],
    gaps: Array[Array[Int]],
) {
  def nPatterns: Int = types.length
  def length: Int    = if (types.isEmpty) 0 else types(0).length

  /** Dimension-table view (`pattern_id, types, gaps`) for joins against
    * generated streams.
    */
  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    types.indices
      .map(i => (i, types(i).toSeq, gaps(i).toSeq))
      .toDF("pattern_id", "types", "gaps")
  }
}

final case class PatternSpec(
    nPatterns: Int = 10,
    patternLength: Int = 5,
    nTypes: Int = 20,
    gapDist: Rng.IntervalDist = Rng.IntervalDist.Uniform,
    gapBase: Int = 5,
    gapLow: Int = 2,
    gapHigh: Int = 9,
    seed: Long = 137L,
)

/** ≡ `generate_patterns` (`eventstream.py:140-183`): types uniform over
  * [0, nTypes) with duplicates allowed; per-cell gap sampling via the
  * interval sampler; validates patternLength >= 2 (`:164-165`).
  */
object Patterns {
  def generate(spec: PatternSpec): PatternSet = {
    require(spec.patternLength >= 2, "pattern_length must be >= 2")
    val typeRng = new Rng.Stream(spec.seed, stream = 0L)
    val gapRng  = new Rng.Stream(spec.seed, stream = 1L)
    val types = Array.tabulate(spec.nPatterns, spec.patternLength) {
      (_, _) => typeRng.nextInt(0, spec.nTypes - 1)
    }
    val gaps = Array.tabulate(spec.nPatterns, spec.patternLength - 1) {
      (_, _) =>
        Rng.interval(spec.gapBase, spec.gapDist, gapRng, spec.gapLow,
          spec.gapHigh)
    }
    PatternSet(types, gaps)
  }
}
