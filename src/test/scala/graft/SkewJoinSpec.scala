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

  test("AQE switches a shuffle join to broadcast at runtime when the built " +
    "side turns out small (runtime re-plan, the 100 TB safety net)") {
    val s = spark
    // static planner must NOT broadcast (size stats say 'big'); only the
    // RUNTIME shuffle statistics reveal the filtered side is tiny
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10m")
    val prev = confs.map { case (k, _) =>
      k -> scala.util.Try(s.conf.get(k)).toOption.filter(_ != null) }
    try {
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      val small = Tables.orders(s, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"))
      val j = Tables.lineitem(s, sfDir).select(col("l_orderkey"), col("l_quantity"))
        .join(small, col("l_orderkey") === col("o_orderkey"))
      j.collect() // finalize the adaptive plan
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.contains("BroadcastHashJoin"),
        s"AQE should have re-planned SMJ -> BHJ from runtime sizes:\n$plan")
    } finally prev.foreach { case (k, vOpt) =>
      vOpt.fold(s.conf.unset(k))(v => s.conf.set(k, v)) }
  }

  test("dynamic partition pruning: a selective dim filter prunes the " +
    "partitioned fact scan at runtime") {
    val s = spark
    // fact = documents partitioned by lang (the q113 layout); dim = a
    // one-row relation selecting a single lang through a non-partition
    // predicate, so static pruning cannot apply
    val factDir = graft.ops.Layout.partitionedDocsDir(s, sfDir)
    val fact = s.read.parquet(factDir)
    import s.implicits._
    // the dim must be FILE-backed: on a LocalRelation the filter constant-
    // folds away before the PartitionPruning rule looks for a selective
    // predicate, and no DPP subquery is inserted
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    Seq(("en", "keep"), ("de", "drop"), ("es", "drop"), ("fr", "drop"))
      .toDF("lang_key", "action").write.mode("overwrite").parquet(dimDir)
    val dim = s.read.parquet(dimDir).filter(col("action") === "keep")
    val saved = scala.util.Try(s.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")).toOption
    try {
      s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
      val j = fact.join(dim, col("lang") === col("lang_key"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"fact scan should carry a dynamic pruning subquery:\n$plan")
      // and the pruned result is exactly the en partition
      assert(j.count() == fact.filter(col("lang") === "en").count())
    } finally saved.fold(s.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.enabled"))(
      v => s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", v))
  }
}
