package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.BackwardAsOfStrategy

/** Catalyst extension entry point for the engine's custom operators —
  * deploy with
  * {{{ spark.sql.extensions=graft.plans.GraftExtensions }}}
  * (or `SparkSession.builder.withExtensions(new GraftExtensions)`). Injects
  * the planner strategy for the partitioned-merge backward as-of join
  * (org.apache.spark.sql.graft.BackwardAsOf). `AsOfJoin.backwardMerged`
  * also self-registers the strategy through
  * `spark.experimental.extraStrategies` for sessions built without the
  * extension, so the facade works either way. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectPlannerStrategy(_ => BackwardAsOfStrategy)
}
