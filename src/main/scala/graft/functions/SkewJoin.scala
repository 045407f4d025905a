package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (the manual fallback when AQE's
  * skew-join splitting isn't enough — e.g. a single pathological key that
  * dominates a partition).
  *
  * The skewed probe side gets a deterministic salt in [0, saltFactor)
  * hashed from a secondary column (so the same row always lands in the
  * same salted partition — important for retries/speculation); the build
  * side is replicated saltFactor times. The shuffle then partitions on
  * (key, salt), spreading one hot key over saltFactor reducers. Results
  * are identical to the unsalted join; only the partitioning changes.
  */
object SkewJoin {
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      skewedKey: String,
      otherKey: String,
      saltSource: Column,
      saltFactor: Int = 8): DataFrame = {
    val saltedLeft = skewed.withColumn("__salt", pmod(hash(saltSource), lit(saltFactor)))
    val replicatedRight = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(replicatedRight,
        saltedLeft(skewedKey) === replicatedRight(otherKey) &&
          saltedLeft("__salt") === replicatedRight("__salt"))
      .drop("__salt")
  }
}
