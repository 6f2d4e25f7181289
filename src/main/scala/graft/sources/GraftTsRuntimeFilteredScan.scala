package graft.sources

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, In, Literal}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Literal => V2Literal}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.types.DataType

/** The graft-ts V2 scan with RUNTIME file-group filtering — the dynamic
  * partition pruning analogue for a table whose partition column is
  * connector-internal: when this table is equi-joined against a selective
  * (typically broadcast) side, Spark's `PartitionPruning` rule sees the
  * scan implement [[SupportsRuntimeV2Filtering]] on the declared index
  * columns, plants a `dynamicpruning` subquery, and `BatchScanExec` hands
  * the materialized join keys to [[filter]] BEFORE tasks launch. The keys
  * become ordinary catalyst `IN` conjuncts appended to the data filters,
  * so the existing planning-time skip machinery prunes FILES with them:
  * Bloom sidecars reject files that cannot hold any key
  * ([[GraftTsStatsFileIndex.eqProbeHashes]]), declared-stats spans reject
  * files whose [lo, hi] excludes every key, and per-file ts spans bound a
  * runtime ts probe set.
  *
  * At 100 TB this is the "join a small user dimension to the fact table"
  * pattern: without it every fact file is planned and scanned and the join
  * discards ~all rows; with it the scan plans only the files whose index
  * admits at least one live key — the same I/O shape as an explicit
  * `lookupEq`, but reached from plain declarative SQL.
  *
  * Soundness mirrors the static path exactly: the appended conjuncts are
  * implied by the join (the join output needs matching keys), files
  * without index entries are never skipped, and the exact join re-applies
  * on every surviving row. A runtime filter that arrives in a shape the
  * index cannot use (non-literal, mistyped after a cast, a column with no
  * recorded bits) degrades to a no-op, never to wrong results.
  *
  * Mechanics: extends the stock [[ParquetScan]] (so codegen'd vectorized
  * reading, statistics reporting, and exchange-reuse equality are
  * untouched) and overrides [[partitions]] to re-plan through a scan
  * whose dataFilters carry the runtime conjuncts — the file index consumes
  * them in `listFiles`. `filterAttributes` advertises only columns present
  * in the PRUNED read schema: Spark resolves every advertised reference
  * against the scan relation's output, so advertising a projected-out
  * column would fail resolution. */
final class GraftTsRuntimeFilteredScan(
    base: ParquetScan,
    filterable: Map[String, DataType])
  extends ParquetScan(base.sparkSession, base.hadoopConf, base.fileIndex,
    base.dataSchema, base.readDataSchema, base.readPartitionSchema,
    base.pushedFilters, base.options, base.pushedAggregate,
    base.partitionFilters, base.dataFilters, base.pushedVariantExtractions)
  with SupportsRuntimeV2Filtering {

  // written once by filter() on the driver before any partition planning;
  // volatile because BatchScanExec may re-plan from another thread (AQE)
  @volatile private var runtimeDataFilters: Seq[Expression] = Nil

  override def filterAttributes(): Array[NamedReference] = {
    val present = readDataSchema.fieldNames.map(_.toLowerCase).toSet
    filterable.keysIterator
      .filter(n => present.contains(n.toLowerCase))
      .map(n => Expressions.column(n))
      .toArray
  }

  override def filter(predicates: Array[Predicate]): Unit = {
    val exprs = predicates.toSeq.flatMap(toCatalystConjunct)
    if (exprs.nonEmpty) runtimeDataFilters = runtimeDataFilters ++ exprs
  }

  /** Statistics from the PRUNED file listing — the stock V2 `FileScan`
    * estimate multiplies the WHOLE index's bytes by the column-width
    * ratio, so a one-day slice of a 100 TB table reports 100 TB and the
    * planner never broadcasts it. This override runs the same formula
    * over `listFiles(partitionFilters, dataFilters ++ runtime)` — the
    * exact file set the scan will read after date-partition, ts-span,
    * Bloom, and runtime-key skipping — which is what lets a narrow range
    * read join as the build side without a hint. One in-memory listing
    * pass at planning time; no I/O. */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val prunedBytes = fileIndex
      .listFiles(partitionFilters, dataFilters ++ runtimeDataFilters)
      .flatMap(_.files).map(_.getLen).sum
    val fullRow =
      (dataSchema.defaultSize + fileIndex.partitionSchema.defaultSize).toDouble
    val readRow =
      (readDataSchema.defaultSize + readPartitionSchema.defaultSize).toDouble
    val size = (conf.fileCompressionFactor * prunedBytes *
      (if (fullRow > 0) readRow / fullRow else 1.0)).toLong
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(size)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  // widened to public so the re-planning instance below is callable; the
  // inner instance carries the merged filters baked into its base scan and
  // an empty runtime list, so it computes partitions the stock way
  override def partitions: Seq[FilePartition] = {
    val extra = runtimeDataFilters
    if (extra.isEmpty) super.partitions
    else new GraftTsRuntimeFilteredScan(
      ParquetScan(sparkSession, hadoopConf, fileIndex, dataSchema,
        readDataSchema, readPartitionSchema, pushedFilters, options,
        pushedAggregate, partitionFilters, dataFilters ++ extra,
        pushedVariantExtractions),
      filterable).partitions
  }

  /** Runtime V2 predicate → catalyst conjunct on a filterable column.
    * Spark's runtime filters arrive as `IN(col, v1, …, vn)` (a
    * materialized DynamicPruning subquery) or `=`; anything else — and any
    * value set Catalyst chose to cast away from the column's own type —
    * conservatively contributes nothing. The attribute is typed from the
    * TABLE schema (the index side's contract), and literals keep their
    * V2-internal representation, which is already catalyst-internal. */
  private def toCatalystConjunct(p: Predicate): Option[Expression] = {
    def attr(ref: NamedReference): Option[AttributeReference] = {
      val name = ref.fieldNames().last
      filterable.collectFirst { case (n, dt) if n.equalsIgnoreCase(name) =>
        AttributeReference(n, dt, nullable = true)()
      }
    }
    p.name() match {
      case "IN" => p.children() match {
        case Array(ref: NamedReference, values @ _*)
            if values.nonEmpty && values.forall(_.isInstanceOf[V2Literal[_]]) =>
          attr(ref).map { a =>
            In(a, values.map { case l: V2Literal[_] =>
              Literal(l.value, l.dataType)
            }.toSeq)
          }
        case _ => None
      }
      case "=" => p.children() match {
        case Array(ref: NamedReference, l: V2Literal[_]) =>
          attr(ref).map(a => EqualTo(a, Literal(l.value, l.dataType)))
        case Array(l: V2Literal[_], ref: NamedReference) =>
          attr(ref).map(a => EqualTo(a, Literal(l.value, l.dataType)))
        case _ => None
      }
      case _ => None
    }
  }
}
