package graft.sources

import graft.ts.TsTable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style SQL maintenance procedures for graft-ts stores, served
  * through [[GraftTsCatalog]]'s `ProcedureCatalog` face:
  *
  * {{{
  *   CALL graft_ts.system.compact(`table` => '/data/trades')
  *   CALL graft_ts.system.expire_snapshots(`table` => '/data/trades',
  *                                         keep_last => 10)
  *   CALL graft_ts.system.restore(`table` => '/data/trades', version => 3)
  *   CALL graft_ts.system.history(`table` => '/data/trades')
  * }}}
  *
  * Each CALL delegates to the facade verb (same snapshot commits, same
  * archive discipline — nothing reimplemented) and returns its report as
  * rows via a [[LocalScan]]: compacted days, expired versions, the
  * restore's new current version, or the commit log. This closes the
  * operational loop for SQL-only users: read (SELECT/AS OF), write
  * (INSERT), delete (DELETE FROM), and now maintenance — no Scala handle
  * required anywhere in the lifecycle. */
private[sources] object GraftTsProcedures {

  private def spark: SparkSession = SparkSession.active

  /** One result row of strings/longs → InternalRow (UTF8String coercion). */
  private def row(vs: Any*): InternalRow =
    InternalRow.fromSeq(vs.map {
      case s: String => UTF8String.fromString(s)
      case other => other
    })

  private final class ResultScan(schema: StructType, rs: Seq[InternalRow])
      extends LocalScan {
    override def rows(): Array[InternalRow] = rs.toArray
    override def readSchema(): StructType = schema
  }

  private def result(schema: StructType, rs: Seq[InternalRow])
      : java.util.Iterator[Scan] =
    java.util.Collections.singletonList[Scan](new ResultScan(schema, rs))
      .iterator()

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private def inDefault(name: String, dt: DataType,
                        default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** Boilerplate collapse: an unbound procedure whose binding is static
    * (parameters don't depend on the input types — ours never do). */
  private abstract class Proc(procName: String, procDesc: String,
                              params: Array[ProcedureParameter])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = procDesc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false // mutates / reads live state
  }

  private val Compact = new Proc("compact",
    "Rewrite every day partition holding more than target_files data files " +
      "(TsTable.compactAll); returns the rewritten dates. Optional " +
      "cluster_by ('colA,colB[,…]') re-sorts each day along the Morton " +
      "curve of the named columns instead of ts (z-order re-clustering on " +
      "the governed store — rectangle predicates then skip files via the " +
      "per-file colStats spans)",
    Array(in("table", StringType),
      inDefault("target_files", IntegerType, "1"),
      inDefault("cluster_by", StringType, "''"))) {
    private val out = StructType(Seq(StructField("p_date", StringType)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val clusterBy =
        if (input.isNullAt(2)) Seq.empty[String]
        else input.getUTF8String(2).toString.split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
      val days = TsTable.open(spark, input.getUTF8String(0).toString)
        .compactAll(input.getInt(1), clusterBy)
      result(out, days.map(row(_)))
    }
  }

  private val ExpireSnapshots = new Proc("expire_snapshots",
    "Keep the newest keep_last snapshot versions, delete older manifests " +
      "and unreferenced archived files (TsTable.expireSnapshots); returns " +
      "the expired versions",
    Array(in("table", StringType),
      inDefault("keep_last", IntegerType, "1"))) {
    private val out = StructType(Seq(StructField("version", LongType)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val expired = TsTable.open(spark, input.getUTF8String(0).toString)
        .expireSnapshots(input.getInt(1))
      result(out, expired.map(row(_)))
    }
  }

  private val Restore = new Proc("restore",
    "Roll the live table back to a committed version (TsTable.restore — " +
      "history moves forward, never rewrites); returns the restored and " +
      "new current versions",
    Array(in("table", StringType), in("version", LongType))) {
    private val out = StructType(Seq(
      StructField("restored_version", LongType),
      StructField("current_version", LongType)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val path = input.getUTF8String(0).toString
      val v = input.getLong(1)
      val t = TsTable.open(spark, path)
      t.restore(v)
      result(out, Seq(row(v,
        TsTable.open(spark, path).currentVersion.getOrElse(-1L))))
    }
  }

  private val Clone = new Proc("clone",
    "Materialize a committed version as an INDEPENDENT table at dest " +
      "(TsTable.cloneAt — deep clone via the distributed one-task-per-file " +
      "copy; nothing links back to the source); returns the clone's " +
      "location and size",
    Array(in("table", StringType), in("version", LongType),
      in("dest", StringType))) {
    private val out = StructType(Seq(
      StructField("dest", StringType),
      StructField("cloned_version", LongType),
      StructField("n_files", LongType)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t = TsTable.open(spark, input.getUTF8String(0).toString)
      val v = input.getLong(1)
      val dest = input.getUTF8String(2).toString
      val clone = t.cloneAt(v, dest)
      result(out, Seq(row(dest, v, clone.detail.head().getLong(4))))
    }
  }

  private val History = new Proc("history",
    "The table's commit log: one row per retained snapshot version " +
      "(metadata-only; bounded by the retained-history ceiling)",
    Array(in("table", StringType))) {
    private val out = StructType(Seq(
      StructField("version", LongType), StructField("action", StringType),
      StructField("n_files", LongType), StructField("n_bytes", LongType)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val rs = TsTable.open(spark, input.getUTF8String(0).toString)
        .history.collect() // bounded: maxVersions manifests
        .map(r => row(r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      result(out, rs.toSeq)
    }
  }

  private val MigrateFieldIds = new Proc("migrate_field_ids",
    "In-place upgrade to parquet field ids (TsTable.migrateFieldIds): one " +
      "governed copy-on-write rewrite of exactly the live files whose " +
      "footers carry no ids — the verb that makes RENAME COLUMN legal on " +
      "a pre-field-id or attached-foreign store; commits a " +
      "content-preserving 'migrate' version; returns the rewritten-file " +
      "count (0 = already migrated)",
    Array(in("table", StringType),
      inDefault("files_per_day", IntegerType, "1"))) {
    private val out =
      StructType(Seq(StructField("rewritten_files", IntegerType)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val n = TsTable.open(spark, input.getUTF8String(0).toString)
        .migrateFieldIds(input.getInt(1))
      result(out, Seq(row(n)))
    }
  }

  private val DeclareIndexing = new Proc("declare_indexing",
    "Declare (or re-declare) the table's skip-index columns after data " +
      "exists (TsTable.declareIndexing — the CREATE INDEX analogue): " +
      "stats_cols get per-file min/max spans, bloom_cols get per-file " +
      "membership bits; ONE 'indexing' commit backfills every live file " +
      "missing the new columns (footers + one column-pruned scan). " +
      "Comma-separated column lists; '' clears",
    Array(in("table", StringType),
      inDefault("stats_cols", StringType, "''"),
      inDefault("bloom_cols", StringType, "''"))) {
    private val out = StructType(Seq(
      StructField("stats_cols", StringType),
      StructField("bloom_cols", StringType),
      StructField("indexed_version", LongType)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      def cols(i: Int): Seq[String] =
        if (input.isNullAt(i)) Seq.empty
        else input.getUTF8String(i).toString.split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
      val t = TsTable.open(spark, input.getUTF8String(0).toString)
        .declareIndexing(cols(1), cols(2))
      // echo the CANONICAL resolved labels from the post-declare handle,
      // not the caller's raw strings — mixed-case input resolves
      // case-insensitively and the descriptor stores the canonical names
      result(out, Seq(row(
        t.writeOptions.statsCols.mkString(","),
        t.writeOptions.bloomCols.mkString(","),
        t.currentVersion.getOrElse(-1L))))
    }
  }

  private val VacuumStaging = new Proc("vacuum_staging",
    "Delete crash-leftover staging (aged _delete_tmp/_compact_tmp_* dirs, " +
      "_tmp-* files) older than older_than_ms; returns the removed paths",
    Array(in("table", StringType),
      inDefault("older_than_ms", LongType, "86400000"))) {
    private val out = StructType(Seq(StructField("removed", StringType)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val removed = TsTable.open(spark, input.getUTF8String(0).toString)
        .vacuumStaging(input.getLong(1))
      result(out, removed.map(row(_)))
    }
  }

  private val Detail = new Proc("detail",
    "One-row table summary (TsTable.detail — the DESCRIBE DETAIL " +
      "analogue): live layout, snapshot/archive footprint, declared " +
      "indexes and constraints; metadata-only",
    Array(in("table", StringType))) {
    private val out = StructType(Seq(
      StructField("path", StringType), StructField("ts_col", StringType),
      StructField("n_columns", IntegerType),
      StructField("n_partitions", LongType), StructField("n_files", LongType),
      StructField("n_bytes", LongType), StructField("n_versions", LongType),
      StructField("current_version", LongType),
      StructField("n_archived_files", LongType),
      StructField("n_archived_bytes", LongType),
      StructField("stats_cols", StringType),
      StructField("bloom_cols", StringType),
      StructField("checks", StringType), StructField("dropped", StringType)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val r = TsTable.open(spark, input.getUTF8String(0).toString).detail.head()
      result(out, Seq(row(r.toSeq: _*)))
    }
  }

  private val all: Seq[Proc] =
    Seq(Compact, ExpireSnapshots, Restore, Clone, History, MigrateFieldIds,
      DeclareIndexing, VacuumStaging, Detail)

  def names: Array[String] = all.map(_.name()).toArray

  def load(name: String): Option[UnboundProcedure] =
    all.find(_.name().equalsIgnoreCase(name))
}
