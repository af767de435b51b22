package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (the manual counterpart to AQE's skew-join
  * splitting, for when a single key dominates a shuffle).
  *
  * Salting is deterministic here — the salt is derived from a hash of a
  * high-cardinality companion column, not rand() — so results stay
  * reproducible run-to-run (and oracle-checkable if used in a declared
  * query).
  */
object SkewUtils {

  /** Two-phase aggregation: groupBy(key, salt) partial → groupBy(key)
    * final. Breaks one hot key's partition into `buckets` pieces; the
    * second shuffle moves only `buckets` rows per key.
    * `saltSource` must be non-deterministic-free (a real column). */
  def saltedCountSum(df: DataFrame, key: Column, saltSource: Column,
                     sumCol: Column, buckets: Int = 16): DataFrame = {
    // buckets <= 0 degenerates silently: pmod(x, 0) is NULL in Spark SQL,
    // collapsing every salt to one group (unsalted but right answers
    // here; a silently EMPTY join in saltedJoin below). Fail at the call.
    require(buckets >= 1, s"salt buckets must be >= 1, got $buckets")
    df
      .withColumn("__salt", pmod(hash(saltSource), lit(buckets)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(count(lit(1)).as("pc"), sum(sumCol).as("ps"))
      .groupBy("k")
      .agg(sum("pc").as("cnt"), sum("ps").as("total"))
  }

  /** Salted broadcast-free join: the big (skewed) side gets a salt from a
    * companion column; the small side is exploded × buckets so every
    * (key, salt) pair still matches. Shuffle partitions for the hot key
    * spread over `buckets` reducers. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, saltSource: Column, buckets: Int = 16): DataFrame = {
    // buckets <= 0: the big side's pmod salt is NULL while the small
    // side's explode(sequence(0, buckets-1)) is the DESCENDING sequence
    // [0, -1] — the salt equi-join matches nothing and the join is
    // silently EMPTY.
    require(buckets >= 1, s"salt buckets must be >= 1, got $buckets")
    // Same contract as writeZOrdered's __graft_z: a caller column named
    // __salt would be silently overwritten and then dropped from BOTH
    // sides by the final drop.
    for (side <- Seq(big, small))
      require(!side.columns.contains("__salt"),
        "input already has a __salt column — rename it before a salted join")
    val salted = big.withColumn("__salt", pmod(hash(saltSource), lit(buckets)))
    val expanded = small.withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(expanded,
      salted(bigKey) === expanded(smallKey) && salted("__salt") === expanded("__salt"))
      .drop("__salt")
  }
}
