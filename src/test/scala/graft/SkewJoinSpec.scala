package graft

import org.apache.spark.sql.functions._

import graft.functions.SkewJoin
import graft.sources.Tables

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the rows of the plain join") {
    val l = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
    val plain = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"))
    val salted = SkewJoin.saltedJoin(l, o, "l_orderkey", "o_orderkey",
        saltSource = col("l_linenumber"), saltFactor = 8)
      .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"))
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salted join shuffles on (key, salt)") {
    val l = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    // disable auto-broadcast so the shuffle partitioning is visible
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = SkewJoin.saltedJoin(l, o, "l_orderkey", "o_orderkey",
        saltSource = col("l_linenumber"), saltFactor = 8)
        .queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), s"salt must be part of the join keys:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
