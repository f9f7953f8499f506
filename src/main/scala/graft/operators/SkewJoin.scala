package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A plain shuffle join sends every row of a hot key to ONE reducer; at
  * 100 TB one pathological key (null user_id, empty document, default
  * enum) serializes the whole stage. Salting splits each hot key into
  * `salts` shuffle partitions:
  *
  *  - fact side: salt = deterministic spread over [0, salts)
  *  - dim side: exploded ×salts (each dim row replicated once per salt)
  *  - equi-join on (key, salt), then salt dropped.
  *
  * Result rows are identical to the unsalted join; only the partitioning
  * changes. AQE's skew-join split handles moderate skew automatically —
  * this operator is for the extreme tail where even one key exceeds a
  * task's memory, or when AQE is off (deterministic benchmarking).
  */
object SkewJoin {

  /** Inner equi-join of `fact` (big, skewed, key `factKey`) with `dim`
    * (small enough to replicate ×salts, key `dimKey`).
    */
  def saltedInner(fact: DataFrame, dim: DataFrame, factKey: String,
      salts: Int, dimKey: String = null): DataFrame = {
    require(salts >= 1)
    val dk = Option(dimKey).getOrElse(factKey)
    // Deterministic per-row spread: hash of the whole fact row modulo
    // salts. Any spread works (correctness never depends on salt values);
    // hashing the row avoids a second pass and keeps re-runs stable.
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val saltedDim = dim
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dk) &&
          saltedFact("__salt") === saltedDim("__salt"))
      .drop(saltedDim(dk)).drop(saltedFact("__salt")).drop(saltedDim("__salt"))
  }
}
