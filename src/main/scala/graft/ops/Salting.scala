package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salting for hot-key joins (SURVEY.md §2.b / the 100 TB
  * checklist): when one join key carries a pathological share of the
  * fact rows, AQE's skew-join split helps sort-merge joins but a
  * replicated-dimension salt is the general fix — fact rows fan out
  * over `salts` sub-keys while the (small) dimension side is replicated
  * once per salt, so the hot key's rows land on `salts` different
  * reducers instead of one.
  *
  * The salt is DERIVED from a caller-named unique column via xxhash64 —
  * never `rand()` — so results are reproducible under any partitioning
  * (same determinism rule as the generator, SURVEY.md §7.5.3).
  */
object Salting {

  /** Inner equi-join `fact ⋈ dim` on `key`, salted. `rowIdCol` must be a
    * unique (or near-unique) fact column; `dim` should be the small side
    * (it is replicated `salts` times before the join).
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      rowIdCol: String,
      salts: Int = 16,
  ): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val saltedFact = fact.withColumn(
      "_salt",
      pmod(xxhash64(col(rowIdCol)), lit(salts.toLong)).cast("int"),
    )
    val replicatedDim = dim.withColumn(
      "_salt",
      explode(array((0 until salts).map(lit(_)): _*)),
    )
    saltedFact
      .join(replicatedDim, Seq(key, "_salt"))
      .drop("_salt")
  }
}
