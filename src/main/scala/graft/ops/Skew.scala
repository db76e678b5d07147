package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY.md §4 "100 TB posture").
  *
  * When one join key value dominates (a `char_name`-like hot key), a plain
  * hash join sends the whole hot partition to one reducer. Salting splits
  * each hot key across `factor` reducers: the large side gets a salt in
  * [0, factor); the small side is replicated once per salt value; the join
  * key becomes (key, salt). Results are identical to the unsalted join —
  * proven in SkewSpec. AQE's skew-join handles sort-merge cases adaptively;
  * salting remains the explicit tool for aggregations and broadcast-unfit
  * dimensions.
  */
object Skew {

  /** Equi join `big ⋈ small` on `key`, salted `factor` ways.
    * The salt on the big side derives from spark_partition_id + a row hash —
    * any value in range works; it only spreads rows, never changes matches. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor > 0)
    val salted = big.withColumn("__salt",
      pmod(hash(col(key), spark_partition_id(), monotonically_increasing_id()), lit(factor)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted grouped count: groupBy(key, salt) partial → groupBy(key) final.
    * Two small shuffles instead of one skewed one. */
  def saltedCount(df: DataFrame, key: String, factor: Int): DataFrame =
    df.withColumn("__salt",
        pmod(hash(col(key), spark_partition_id(), monotonically_increasing_id()), lit(factor)))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__partial"))
      .groupBy(col(key)).agg(sum(col("__partial")).as("n"))
}
