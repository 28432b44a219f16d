package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB joins/aggregations. AQE's skew-join
  * handles sort-merge cases adaptively; these explicit tools cover the
  * patterns AQE cannot: skewed keys into a *broadcastable-but-not-broadcast*
  * side, and skewed aggregation keys.
  */
object Skew {

  /** Salted equi-join for a skewed left side: left keys get a random salt
    * in [0, salts), the right side is replicated `salts` times, and the
    * join key becomes (key, salt) — splitting each hot key across `salts`
    * reducers. Result equals `big.join(small, keys)` exactly.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong))
        .cast("int"))
    val replicated = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group keys:
    * first aggregate on (key, salt), then re-aggregate on key. `partial`
    * builds the salted-level aggregates; `merge` combines them. Count/sum
    * style algebraic aggregates only.
    */
  def twoPhaseAgg(df: DataFrame, key: String, salts: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    salted.groupBy(col(key), col("_salt")).agg(partial.head, partial.tail: _*)
      .groupBy(col(key)).agg(merge.head, merge.tail: _*)
  }
}
