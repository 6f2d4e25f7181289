package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan

/** Shared test helper: dig the V2 parquet scan out of an (AQE-wrapped)
  * physical plan — used by the connector specs to assert planning-time
  * file skipping. */
object V2ScanAccess {
  def parquetScan(plan: SparkPlan): ParquetScan = {
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        unwrap(a.executedPlan)
      case other => other.collectLeaves().flatMap {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          unwrap(a.executedPlan)
        case l => Seq(l)
      }
    }
    unwrap(plan).collectFirst {
      case b: BatchScanExec if b.scan.isInstanceOf[ParquetScan] =>
        b.scan.asInstanceOf[ParquetScan]
    }.getOrElse(throw new AssertionError(s"no V2 parquet scan in plan:\n$plan"))
  }
}
