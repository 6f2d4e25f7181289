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

  // skip indexes: manifest spans/colStats and the version's Bloom sidecar,
  // keyed by the RESOLVED path each file serves from. Resolution strips
  // the table root (and the archive segment) back to the manifest's
  // TABLE-RELATIVE key — never the basename: one write task landing in
  // several day partitions gives every partition the SAME part-file name
  // (part-00000-<jobUUID>), and basename keying collapsed those files
  // onto one span, making the ts-span skip prune files that DO intersect
  // the query range (silent row loss, caught when the V1 facade unified
  // onto this index).
  private def relOf(p: Path): String = {
    val root = tablePath.toString
    val s = p.toString
    val archPrefix = s"$root/_ts_archive/"
    if (s.startsWith(archPrefix)) s.substring(archPrefix.length)
    else if (s.startsWith(root + "/")) s.substring(root.length + 1)
    else p.getName // foreign layout: fall back, matching at worst nothing
  }

  private def resolveByName[A](byRel: Map[String, A]): Map[Path, A] =
    statuses.flatMap { case (_, st) =>
      byRel.get(relOf(st.getPath)).map(st.getPath -> _)
    }.toMap

  private lazy val spanByPath: Map[Path, (Long, Long)] =
    resolveByName(snapshot.fileTsSpans)

  private lazy val colByPath: Map[Path, Map[String, graft.ts.ColSpan]] =
    resolveByName(snapshot.manifestColStats)

  private lazy val statCols: Seq[String] =
    colByPath.valuesIterator.flatMap(_.keysIterator).toSet.toSeq

  private lazy val bloomByPath
      : Map[Path, Map[String, org.apache.spark.util.sketch.BloomFilter]] =
    resolveByName(snapshot.fileBlooms).map { case (p, cols) =>
      p -> cols.map { case (c, bytes) =>
        c -> org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(bytes))
      }
    }

  // probe-GATING names come from the table descriptor (one tiny read),
  // NOT from the sidecar: a pure range read over a large pinned table
  // must not pay the full per-file/per-column Bloom sidecar in driver
  // memory when the filters carry no equality probe. bloomByPath is only
  // forced once a declared column is actually probed. A column whose
  // Bloom membership existed at the pinned version but was later dropped
  // from the descriptor simply loses its skip (sound — every file kept).
  private lazy val declaredBloomCols: Seq[String] =
    scala.util.Try(
      TsTable.open(snapshot.spark, snapshot.tablePath).writeOptions.bloomCols
    ).getOrElse(Seq.empty)

  /** Same planning-time file skipping as the live index
    * ([[GraftTsStatsFileIndex]]): drop files whose recorded closed ts
    * span cannot intersect the pushed ts bounds, whose declared-stats
    * span excludes every probed value, or whose Bloom bits reject every
    * equality probe; unindexed files always survive. A pinned needle
    * query (one user's rows as of last month's version) plans the same
    * file set the live lookup would — time travel keeps the indexes. */
  override def listFiles(
      partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.execution.datasources.PartitionDirectory] = {
    val dirs = super.listFiles(partitionFilters, dataFilters)
    // no data filters → nothing to skip on; return BEFORE forcing any of
    // the lazy index state (declaredBloomCols costs a descriptor read per
    // index instance — a plain unfiltered scan, e.g. a change-feed diff
    // arm, must not pay it)
    if (dataFilters.isEmpty) return dirs
    if (spanByPath.isEmpty && colByPath.isEmpty && declaredBloomCols.isEmpty)
      return dirs
    val (lo, hi) = GraftTsStatsFileIndex.tsBounds(dataFilters, snapshot.tsCol)
    val colBounds = statCols.flatMap { c =>
      val b = GraftTsStatsFileIndex.numBounds(dataFilters, c)
      if (b._1.isEmpty && b._2.isEmpty) None else Some((c, b._1, b._2))
    }
    val bloomProbes = declaredBloomCols.flatMap { c =>
      GraftTsStatsFileIndex.eqProbeHashes(dataFilters, c).map(c -> _)
    }
    if (lo.isEmpty && hi.isEmpty && colBounds.isEmpty && bloomProbes.isEmpty)
      return dirs
    dirs.map { pd =>
      pd.copy(files = pd.files.filter { f =>
        val p = f.getPath
        val tsKeep = spanByPath.get(p) match {
          case Some((mn, mx)) => lo.forall(mx >= _) && hi.forall(mn <= _)
          case None => true
        }
        tsKeep && colBounds.forall { case (c, cLo, cHi) =>
          colByPath.get(p).flatMap(_.get(c)) match {
            // 'e' = harvested-but-unskippable marker: keep the file
            case Some(s0) if s0.typ != 'e' =>
              cLo.forall(s0.hiBD >= _) && cHi.forall(s0.loBD <= _)
            case _ => true
          }
        } && bloomProbes.forall { case (c, hashes) =>
          bloomByPath.get(p).flatMap(_.get(c)) match {
            case Some(bf) => hashes.exists(bf.mightContainLong)
            case None => true
          }
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
