package graft.sources

import graft.ts.{TsSnapshot, TsTable}

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{PartitionPath, PartitionSpec, PartitioningAwareFileIndex}
import org.apache.spark.sql.types.{DateType, StructField, StructType}

import scala.collection.mutable

/** File index over one committed TsTable SNAPSHOT — the V2 connector's
  * time-travel backend (`option("asOf", version)`). Where the live table's
  * `InMemoryFileIndex` trusts the directory listing, this index serves
  * EXACTLY the manifest's file set, wherever each file now lives (still in
  * the live tree, or moved to `_ts_archive/` by a later compact/retention)
  * — which is why a pinned V2 read keeps working under concurrent
  * maintenance. Partition VALUES come from the manifest's relative paths,
  * not directory inference, so a date's files may legitimately span two
  * physical directories (live + archive): each becomes its own
  * `PartitionPath` carrying the same date value, and partition pruning on
  * `p_date` works unchanged. File sizes are the manifest's recorded sizes
  * (already integrity-checked during resolution); no extra listing RPCs
  * beyond the one-per-referenced-directory resolution pass. */
final class GraftTsSnapshotFileIndex(
    spark: SparkSession,
    tablePath: Path,
    snapshot: TsSnapshot)
  extends PartitioningAwareFileIndex(spark, Map.empty, None) {

  private val partSchema =
    StructType(Seq(StructField(TsTable.PartCol, DateType, nullable = true)))

  // resolution happens ONCE per index instance (a fresh Table — every
  // load() — gets a fresh index, the live-path rule)
  private val resolvedNow: Seq[(String, Path, Long)] =
    snapshot.resolvedFiles.map { case (date, p, len, _) => (date, p, len) }

  private val statuses: Seq[(String, FileStatus)] = resolvedNow.map {
    case (date, p, len) =>
      // mtime/blocksize synthesized: scans consume path + length; the
      // manifest is the source of truth for membership and size
      date -> new FileStatus(len, false, 1, 0L, 0L, p)
  }

  private val byDir: Seq[((String, Path), Array[FileStatus])] = statuses
    .groupBy { case (date, st) => (date, st.getPath.getParent) }
    .view.mapValues(_.map(_._2).toArray).toSeq

  private val spec: PartitionSpec = PartitionSpec(
    partSchema,
    byDir.map { case ((date, dir), _) =>
      // DateType's internal form is epoch DAYS — derive it TZ-free via
      // LocalDate (java.sql.Date.valueOf + fromJavaDate would round-trip
      // through the JVM default zone and could shift a day on hosts west
      // of UTC — the same trap readRange's in-plan to_date avoids). The
      // empty sentinel = loose root-level files → null partition value.
      PartitionPath(
        InternalRow(
          if (date.isEmpty) null
          else Int.box(java.time.LocalDate.parse(date).toEpochDay.toInt)),
        dir)
    })

  override def partitionSpec(): PartitionSpec = spec

  // span-skip index: manifest spans keyed by the RESOLVED path each file
  // serves from (UUID basenames are unique, so name-level matching is
  // exact across the live/archive split)
  private lazy val spanByPath: Map[Path, (Long, Long)] = {
    val byName = snapshot.fileTsSpans.map { case (rel, s) =>
      rel.split("/").last -> s
    }
    statuses.flatMap { case (_, st) =>
      byName.get(st.getPath.getName).map(st.getPath -> _)
    }.toMap
  }

  /** Same planning-time file skipping as the live index
    * ([[GraftTsStatsFileIndex]]): drop files whose recorded closed ts
    * span cannot intersect the pushed ts bounds; spanless files always
    * survive. Pinned reads of a narrow window over a long-history
    * version stop planning the whole version's file set. */
  override def listFiles(
      partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.execution.datasources.PartitionDirectory] = {
    val dirs = super.listFiles(partitionFilters, dataFilters)
    if (spanByPath.isEmpty) return dirs
    val (lo, hi) = GraftTsStatsFileIndex.tsBounds(dataFilters, snapshot.tsCol)
    if (lo.isEmpty && hi.isEmpty) return dirs
    dirs.map { pd =>
      pd.copy(files = pd.files.filter { f =>
        spanByPath.get(f.getPath) match {
          case Some((mn, mx)) => lo.forall(mx >= _) && hi.forall(mn <= _)
          case None => true
        }
      })
    }
  }

  override protected def leafFiles: mutable.LinkedHashMap[Path, FileStatus] =
    mutable.LinkedHashMap(statuses.map(s => s._2.getPath -> s._2): _*)

  override protected def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    byDir.map { case ((_, dir), fs0) => dir -> fs0 }.toMap

  override def rootPaths: Seq[Path] = Seq(tablePath)

  override def refresh(): Unit = () // immutable by construction
}
