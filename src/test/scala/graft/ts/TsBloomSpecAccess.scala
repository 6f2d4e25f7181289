package graft.ts

import org.apache.spark.sql.SparkSession

/** Test-side window into the `private[ts]` bloom sidecar reader, so
  * TsBloomSpec can assert carry-forward coverage without widening the
  * production API. */
object TsBloomSpecAccess {
  def sidecar(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      path: String, v: Long): Map[String, Map[String, Array[Byte]]] =
    TsTable.readBloomSidecar(fs, path, v)

  /** The candidate pass WITH the manifest it validated — (manifest
    * version, manifest file names, candidates) — so the race spec can
    * assert lookupEq's prune and scan share one authority check. */
  def candidatesWithManifest(t: TsTable, column: String, values: Seq[Any])
      : Option[(Long, Seq[String], Seq[String])] =
    t.bloomCandidatesWithManifest(column, values).map { case (m, cands) =>
      (m.version, m.files.map(_._1), cands)
    }
}
