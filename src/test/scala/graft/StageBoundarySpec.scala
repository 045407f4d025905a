package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** The pluggable stage-boundary materializer (r11): conf-selected
  * local/reliable/none modes, identical data under every mode, plan
  * truncation under the materializing modes, and the explicit
  * block-release path the harnesses call between queries. */
class StageBoundarySpec extends SparkSpec {
  import spark.implicits._

  private def df = spark.range(0, 100).select(col("id"), (col("id") % 7).as("k"))

  private def withMode[A](mode: Option[String])(body: => A): A = {
    val old = spark.conf.getOption(StageBoundaryModeKey)
    mode match {
      case Some(m) => spark.conf.set(StageBoundaryModeKey, m)
      case None => spark.conf.unset(StageBoundaryModeKey)
    }
    try body
    finally {
      old match {
        case Some(m) => spark.conf.set(StageBoundaryModeKey, m)
        case None => spark.conf.unset(StageBoundaryModeKey)
      }
    }
  }

  test("default (local) mode truncates the plan to a LogicalRDD and keeps the rows") {
    withMode(None) {
      val out = df.stageBoundary
      assert(out.queryExecution.logical.isInstanceOf[
        org.apache.spark.sql.execution.LogicalRDD])
      assert(out.collect().map(_.getLong(0)).sorted.toSeq == (0L until 100L))
    }
  }

  test("reliable mode checkpoints to the reliable dir and keeps the rows") {
    withMode(Some("reliable")) {
      val out = df.stageBoundary
      // a reliable checkpoint also reads back as a truncated leaf plan
      assert(out.queryExecution.optimizedPlan.collectLeaves().size == 1)
      assert(out.collect().map(_.getLong(0)).sorted.toSeq == (0L until 100L))
      assert(spark.sparkContext.getCheckpointDir.nonEmpty,
        "reliable mode must have set a checkpoint dir")
    }
  }

  test("none mode is the identity (lineage flows through)") {
    withMode(Some("none")) {
      val in = df
      val out = in.stageBoundary
      assert(out eq in)
    }
  }

  test("releaseStageBoundaries drops the checkpointed blocks") {
    withMode(None) {
      val sc = spark.sparkContext
      releaseStageBoundaries() // drain anything earlier suites queued
      val before = sc.getPersistentRDDs.keySet
      val out = df.stageBoundary
      out.write.format("noop").mode("overwrite").save()
      val pinned = sc.getPersistentRDDs.keySet -- before
      assert(pinned.nonEmpty, "an eager local boundary must pin RDD blocks")
      releaseStageBoundaries()
      // unpersist is async (blocking = false); poll briefly
      def still = sc.getPersistentRDDs.keySet.intersect(pinned)
      val deadline = System.nanoTime() + 10e9.toLong
      while (still.nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(still.isEmpty, s"release must unpin boundary blocks, still: $still")
    }
  }
}
