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

  test("AQE splits a synthetic hot key at runtime (skew=true in the final plan)") {
    val s = spark
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> scala.util.Try(s.conf.get(k)).toOption }
    try {
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      // 90% of 200k rows share key 0 → one shuffle partition dwarfs the rest
      val left = s.range(0, 200000).select(
        when(col("id") % 10 < 9, lit(0L)).otherwise(pmod(col("id"), lit(1000))).as("k"),
        col("id").as("v"))
      val right = s.range(0, 1000).select(col("id").as("k2"))
      val j = left.join(right, col("k") === col("k2"))
      j.collect() // finalize the adaptive plan
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE should have split the hot partition (skew=true):\n$plan")
    } finally prev.foreach { case (k, vOpt) =>
      vOpt.fold(s.conf.unset(k))(v => s.conf.set(k, v)) }
  }
}
