package graft.ts

import org.apache.spark.sql.SparkSession

/** Test-side window into the `private[ts]` bloom sidecar reader, so
  * TsBloomSpec can assert carry-forward coverage without widening the
  * production API. */
object TsBloomSpecAccess {
  def sidecar(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      path: String, v: Long): Map[String, Map[String, Array[Byte]]] =
    TsTable.readBloomSidecar(fs, path, v)
}
