package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** ParquetFileFormat with EXECUTION-time live/archive resolution for
  * graft-ts snapshot reads — the fix for the format's one remaining
  * plan-vs-execute race: a copy-on-write verb (compact / deleteWhere /
  * updateWhere / mergeInto / retention / restore) displaces the files it
  * rewrites by RENAMING them from the live tree into `_ts_archive/` under
  * the SAME relative path (`TsTable.archiveFile`). A batch planned a
  * moment earlier holds the pre-displacement path; without this class the
  * task fails with FILE_NOT_EXIST and a live streaming consumer dies
  * mid-microbatch even though the bytes still exist one directory over.
  *
  * Because basenames are immutable UUIDs and the archive mirrors the
  * partition layout (`p_date=.../<name>` ↔ `_ts_archive/p_date=.../
  * <name>`), the displaced location is derivable from the planned path
  * alone: each task that fails to OPEN its file retries once at the
  * mirrored location (live → archive for a file displaced after
  * planning; archive → live for the symmetric case). Only genuinely
  * expired bytes — `expireSnapshots`, the documented retention horizon —
  * still fail, now with the original error.
  *
  * Everything else (predicate pushdown, vectorized read, whole-stage
  * codegen batch support, schema evolution null-fill) is inherited
  * untouched; the wrapper adds zero cost on the open-succeeds path. Used
  * by [[graft.ts.TsSnapshot]]'s DataFrame construction, which serves
  * every pinned read and every streaming microbatch
  * ([[GraftTsStreamSource]]).
  *
  * Lives under org.apache.spark.sql because
  * `buildReaderWithPartitionValues` is `private[sql]` — same shim rule as
  * [[BloomExprs]]. */
final class ArchiveResolvingParquetFileFormat extends ParquetFileFormat {

  override def toString: String = "GraftTsParquet(archive-resolving)"

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    val base = super.buildReaderWithPartitionValues(sparkSession, dataSchema,
      partitionSchema, requiredSchema, filters, options, hadoopConf)
    file => {
      try base(file)
      catch {
        case e: java.io.FileNotFoundException =>
          ArchiveResolvingParquetFileFormat.mirrorPath(
              file.filePath.toString) match {
            case Some(alt) =>
              try base(file.copy(filePath = SparkPath.fromPathString(alt)))
              catch { case _: java.io.FileNotFoundException => throw e }
            case None => throw e
          }
      }
    }
  }
}

object ArchiveResolvingParquetFileFormat {
  private val ArchiveSeg = "/_ts_archive/"
  private val PartSeg = "/p_date="

  /** The "other" location of a graft-ts data file: strip `_ts_archive`
    * if present, else insert it before the partition directory (or the
    * basename for loose root-level files). Pure string surgery — the
    * archive mirrors the live layout by construction. */
  private[graft] def mirrorPath(p: String): Option[String] = {
    val ai = p.indexOf(ArchiveSeg)
    if (ai >= 0)
      Some(p.substring(0, ai) + "/" + p.substring(ai + ArchiveSeg.length))
    else {
      val pi = p.lastIndexOf(PartSeg)
      val cut = if (pi >= 0) pi else p.lastIndexOf('/')
      if (cut <= 0) None
      else Some(p.substring(0, cut) + ArchiveSeg.dropRight(1) + p.substring(cut))
    }
  }
}
