package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline instrumentation via `Dataset.observe` — named metrics computed
  * map-side (accumulator-style) while an action runs, with NO second pass
  * over the data. This is how a 100 TB pipeline stage reports row counts,
  * null rates, and basic sums without doubling its I/O: a separate
  * `count()`/`agg()` would re-execute the whole plan.
  *
  * The reference's flow prints per-run issue counts (`app.py:127-137`);
  * at scale the equivalent is an observed metric on the report write, not
  * a second aggregation.
  */
object Metrics {
  /** Attach row-count + per-column null-count + numeric-sum metrics to a
    * DataFrame. Returns the instrumented frame and the [[Observation]];
    * `observation.get` blocks until the first action on the frame
    * completes and then yields the metric map. */
  def observed(
      df: DataFrame,
      name: String,
      nullCountCols: Seq[String] = Nil,
      sumCols: Seq[String] = Nil): (DataFrame, Observation) = {
    val obs = Observation(name)
    val metrics: Seq[Column] =
      count(lit(1)).as("rows") +:
        (nullCountCols.map(c => count_if(col(c).isNull).as(s"nulls_$c")) ++
          sumCols.map(c => sum(col(c)).as(s"sum_$c")))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
