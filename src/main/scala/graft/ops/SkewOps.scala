package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §6 / 100 TB posture).
  *
  * AQE's skew-join handling covers joins; for aggregations over hot keys
  * (one key holding a large share of all rows), two-phase salting bounds
  * any single reducer's load: phase 1 aggregates on (key, salt) — the hot
  * key splits across `salts` reducers — phase 2 merges the partials on the
  * key alone. The salt derives from the input partition id: deterministic
  * for a fixed input layout, and rows of a hot key arriving from different
  * input splits land on different reducers.
  *
  * Results are identical to the unsalted aggregate for decomposable
  * aggregates (count/sum/min/max); that identity is the unit-test
  * invariant.
  */
object SkewOps {

  def saltedCount(df: DataFrame, key: Column, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy("key")
      .agg(sum("__partial").as("n"))

  /** Salted exact sum of a 2-decimal monetary column (decimal-cast, so the
    * two-phase merge is order-independent and exact).
    */
  def saltedSum(df: DataFrame, key: Column, value: Column,
      salts: Int): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value.cast("decimal(18,2)")).as("__partial"))
      .groupBy("key")
      .agg(sum("__partial").cast("double").as("total"))

  /** Skew-safe equi-join: `big ⋈ small` on `key`, with the big side
    * salted by input partition and the small side replicated once per
    * salt, so the join key becomes (key, salt) and a hot key's probe rows
    * spread across `salts` reducers instead of landing on one. Row-for-row
    * identical to `big.join(small, key)` (each big row meets each matching
    * small row in exactly one salt replica); costs `salts`× the small
    * side's shuffle volume, which is the right trade whenever
    * |small| ≪ |big| but too large (or too skew-prone itself) to
    * broadcast — the tf⋈df term join in q49 is the canonical case.
    * AQE's skew-join covers sort-merge joins after the fact; this bounds
    * the skew BEFORE the shuffle, deterministically.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame =
    big.withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
      .join(small.withColumn("__salt",
        explode(sequence(lit(0), lit(salts - 1)))), Seq(key, "__salt"))
      .drop("__salt")

  /** Count + exact sum in ONE salted two-phase pass — a production hot-key
    * aggregation computes all its measures over a single scan rather than
    * one salted pipeline per measure.
    */
  def saltedStats(df: DataFrame, key: Column, value: Column,
      salts: Int): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("__n"),
        sum(value.cast("decimal(18,2)")).as("__s"))
      .groupBy("key")
      .agg(sum("__n").as("n"), sum("__s").cast("double").as("total"))
}
