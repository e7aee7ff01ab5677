package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY §2.H).
  *
  * AQE's skew-join splitting (on in GraftSession) handles most runtime skew;
  * explicit salting is for the cases AQE can't fix — e.g. a hot key in a
  * shuffle *aggregation*, or a sort-merge join where one key holds >1
  * partition's worth of rows on BOTH sides.
  */
object Skew {

  /** Join `big` (skewed keys) with `small` on `key`, spreading each hot key
    * over `salts` shuffle partitions: the big side gets a pseudo-random salt
    * per row; the small side is replicated `salts`× so every (key, salt)
    * pair still meets. Use when the small side is too big to broadcast but
    * the big side's key histogram is spiky.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(saltedSmall,
        saltedBig(key) === saltedSmall(key)
          && saltedBig("__salt") === saltedSmall("__salt"))
      .drop(saltedSmall(key)).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for hot-key groupBy: first
    * aggregate on (key, salt), then merge the partials on key. `merges`
    * maps each partial column to its second-phase combiner.
    */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
      partials: Seq[Column], merges: Seq[Column]): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(merges.head, merges.tail: _*)
}
