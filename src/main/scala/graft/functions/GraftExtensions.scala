package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Optimizer rule: rewrite the portable `cosine_sim` Scala UDF into the
  * native codegen'd [[CosineSimilarity]] expression.
  *
  * Users (and the oracle-parity queries) can keep writing the plain UDF —
  * a black box to Catalyst that forces deserialization per row — and the
  * plan still executes the fused whole-stage-codegen loop. Accumulation
  * order is identical (left-to-right doubles), so the rewrite is
  * result-preserving bit-for-bit, not just approximately.
  */
object RewriteCosineUdf extends Rule[LogicalPlan] {
  private def isFloatArray(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case u: ScalaUDF
        if u.udfName.contains("cosine_sim") && u.children.size == 2 &&
          u.children.forall(isFloatArray) =>
      CosineSimilarity(u.children.head, u.children(1))
  }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` form:
  * the full library surface in one injection point — the UDF→native
  * optimizer rewrite, the as-of join planner strategy, and the SQL
  * functions (native cosine + the ngrams generator). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteCosineUdf)
    e.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    e.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
    e.injectFunction((
      FunctionIdentifier("cosine_sim_native"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim_native"),
      exprs => CosineSimilarity(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("ngrams"),
      new ExpressionInfo(classOf[NGrams].getName, "ngrams"),
      exprs => NGrams(exprs.head, exprs(1))))
  }
}

object GraftExtensions {
  /** Runtime installation on an existing session (the extensions config
    * only applies at session construction). */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(RewriteCosineUdf))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteCosineUdf
    graft.plans.Asof.install(spark)
    graft.plans.Interval.install(spark)
  }
}
