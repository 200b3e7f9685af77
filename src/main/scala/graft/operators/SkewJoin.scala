package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join split can't apply (e.g. the skewed side feeds an aggregation
  * that reuses the exchange, or the skew is in a broadcast-ineligible
  * dimension). A hot key that hashes 30% of a 100 TB fact table into one
  * shuffle partition serializes the join through one task; salting splits
  * every key's fact rows across `nSalts` partitions and replicates ONLY
  * the dimension side `nSalts`-fold — dim rows are the cheap side by
  * assumption, so the trade is `nSalts x |dim|` extra shuffle rows for a
  * `nSalts`-way split of the hottest task.
  *
  * The fact-side salt is `xxhash64(key, 77) mod nSalts` over... no — the
  * KEY would put every copy of the hot key in one salt again. The salt
  * must vary WITHIN a key: it hashes the fact row's OTHER columns
  * (`saltBy`), so a key's rows spread uniformly while remaining joinable
  * to the dimension copy carrying their salt. Any salt assignment yields
  * the identical join result — which is exactly what the q22 gate checks
  * against a plain-join oracle.
  */
object SkewJoin {

  /** Inner equi-join `fact.key == dim.key` with an `nSalts`-way split of
    * every fact key. `saltBy` names fact columns whose hash spreads rows
    * within a key (pick high-cardinality payload columns). Output columns:
    * fact.* then dim.* minus its join key.
    */
  def saltedJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      saltBy: Seq[String], nSalts: Int): DataFrame = {
    require(nSalts >= 2 && nSalts <= 1024, s"nSalts out of range: $nSalts")
    require(saltBy.nonEmpty, "saltBy needs at least one fact column")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(saltBy.map(col): _*), lit(nSalts.toLong)))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0L), lit(nSalts - 1L))))
      .withColumnRenamed(dimKey, "__dim_key")
    salted.join(replicated,
        salted(factKey) === col("__dim_key") && salted("__salt") === replicated("__salt"))
      .drop("__salt").drop("__dim_key")
  }
}
