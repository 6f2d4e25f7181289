package graft.sources

import graft.ts.TsTable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util.{Map => JMap}

/** SQL-catalog face of the `graft-ts` connector — the piece that makes
  * time travel a first-class SQL citizen instead of a DataFrame-only
  * option:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft_ts",
  *                  "graft.sources.GraftTsCatalog")
  *   SELECT * FROM graft_ts.`/data/trades`                  -- live table
  *   SELECT * FROM graft_ts.`/data/trades` VERSION AS OF 3  -- pinned
  *   SELECT * FROM graft_ts.`/data/trades`
  *     TIMESTAMP AS OF '2024-01-02 00:00:00'                -- by commit time
  *   INSERT INTO graft_ts.`/data/trades` SELECT ...         -- ordered append
  *   CREATE TABLE graft_ts.`/data/new` (ts TIMESTAMP, v DOUBLE)
  * }}}
  *
  * The identifier IS the store path (Delta's path-catalog convention):
  * `graft_ts.`/abs/path`` resolves `TsTable.open` on that directory;
  * multi-part identifiers join with '/'. `VERSION AS OF v` serves the
  * SAME pinned table as `option("asOf", v)` — one [[GraftTsV2Table]]
  * wrapping the version's snapshot file index, so schema-per-version,
  * archive resolution, pruned scans, and the pinned-write refusal are
  * shared, not reimplemented (parity asserted in GraftTsSourceSpec).
  * `TIMESTAMP AS OF t` resolves to the newest version whose manifest was
  * committed at-or-before `t` (manifest file modification time — wall
  * clock of the commit's rename; a filesystem migration that rewrites
  * mtimes coarsens this, version pins stay exact).
  *
  * Scale notes: resolution is O(1) directory metadata (descriptor +
  * manifest reads); scans/writes are the connector's stock distributed
  * paths. Catalog verbs that would mutate user data wholesale
  * (drop/rename/alter) are refused — table lifecycle stays with the
  * facade's explicit, snapshot-committing verbs.
  */
final class GraftTsCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = "graft_ts"

  /** Maintenance procedures live under the `system` namespace (the
    * Iceberg convention): `CALL graft_ts.system.compact(...)` etc —
    * see [[GraftTsProcedures]]. */
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      GraftTsProcedures.names.map(n => Identifier.of(Array("system"), n))
    else Array.empty

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    val known = ident.namespace().sameElements(Array("system"))
    (if (known) GraftTsProcedures.load(ident.name()) else None).getOrElse(
      throw new RuntimeException(
        s"graft-ts: unknown procedure $ident; available: " +
          GraftTsProcedures.names.map(n => s"$catalogName.system.$n")
            .mkString(", ")))
  }

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  /** The identifier is the path: `graft_ts.`/a/b`` → "/a/b". */
  private def pathOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString("/")

  private def exists(path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Path-addressed catalog: there is no namespace to enumerate. */
  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty

  override def tableExists(ident: Identifier): Boolean = exists(pathOf(ident))

  override def loadTable(ident: Identifier): Table = {
    val path = pathOf(ident)
    if (!exists(path)) throw new NoSuchTableException(ident)
    new GraftTsV2Table(spark, TsTable.open(spark, path), None)
  }

  /** `VERSION AS OF v` — the SQL face of `option("asOf", v)`/`openAt`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val path = pathOf(ident)
    if (!exists(path)) throw new NoSuchTableException(ident)
    val v =
      try version.trim.toLong
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"VERSION AS OF takes a graft-ts snapshot version number, got '$version'")
      }
    new GraftTsV2Table(spark, TsTable.open(spark, path),
      Some(TsTable.openAt(spark, path, v)))
  }

  /** `TIMESTAMP AS OF t` (micros since epoch from the parser): newest
    * version committed at-or-before `t`. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val path = pathOf(ident)
    if (!exists(path)) throw new NoSuchTableException(ident)
    val commits = TsTable.versionCommitMs(spark, path)
    require(commits.nonEmpty,
      s"TIMESTAMP AS OF on '$path': the table has no committed snapshot versions")
    val atOrBefore = commits.filter(_._2 * 1000L <= timestampMicros)
    require(atOrBefore.nonEmpty,
      s"TIMESTAMP AS OF on '$path': no version committed at or before " +
        s"${java.time.Instant.ofEpochMilli(timestampMicros / 1000L)} " +
        s"(earliest commit: ${java.time.Instant.ofEpochMilli(commits.map(_._2).min)})")
    loadTable(ident, atOrBefore.maxBy(_._2)._1.toString)
  }

  /** `CREATE TABLE graft_ts.`/path`` (ts TIMESTAMP, …)` → `TsTable.create`
    * (partition transforms are refused: the daily layout is the format's
    * own, not user-declarable). */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table = {
    require(partitions.isEmpty,
      "graft-ts tables manage their own daily time partitioning; " +
        "PARTITIONED BY is not accepted")
    val path = pathOf(ident)
    val tsCol = Option(properties.get("tsCol")).getOrElse("ts")
    TsTable.create(spark, path, schema, tsCol)
    loadTable(ident)
  }

  /** `ALTER TABLE graft_ts.`/path`` ADD COLUMNS (x DOUBLE, …)` /
    * `DROP COLUMN[S] …` / `RENAME COLUMN a TO b` — the SQL faces of the
    * facade's pure-DDL evolution ([[TsTable.addColumns]] /
    * [[TsTable.dropColumns]] / [[TsTable.renameColumn]]): the descriptor
    * changes, existing files null-fill (add), stop projecting (drop), or
    * relabel by parquet field id (rename) on read; an evolution version
    * commits, and retired names are tombstoned against reuse (stale-byte
    * and stale-index resurrection — the TsTable scaladocs). A mixed or
    * other change set (retype/reorder) would reinterpret history and is
    * refused. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    val drops = changes.collect { case d: TableChange.DeleteColumn => d }
    val renames = changes.collect { case r: TableChange.RenameColumn => r }
    val retypes = changes.collect { case u: TableChange.UpdateColumnType => u }
    val kinds = Seq(adds.nonEmpty, drops.nonEmpty, renames.nonEmpty,
      retypes.nonEmpty).count(identity)
    if (adds.length + drops.length + renames.length + retypes.length !=
          changes.length || kinds != 1)
      throw new UnsupportedOperationException(
        "graft-ts supports ALTER TABLE … ADD COLUMNS, DROP COLUMNS, " +
          "RENAME COLUMN, or ALTER COLUMN … TYPE (lossless widening) " +
          "only — pure-DDL evolution; history is never rewritten")
    if (retypes.nonEmpty) {
      require(retypes.length == 1, "graft-ts ALTER COLUMN TYPE: one at a time")
      val u = retypes.head
      require(u.fieldNames().length == 1,
        s"graft-ts ALTER COLUMN TYPE: nested field " +
          s"'${u.fieldNames().mkString(".")}' is not supported")
      TsTable.open(spark, pathOf(ident))
        .widenColumn(u.fieldNames()(0), u.newDataType())
    } else if (renames.nonEmpty) {
      require(renames.length == 1, "graft-ts RENAME COLUMN: one at a time")
      val r = renames.head
      require(r.fieldNames().length == 1,
        s"graft-ts RENAME COLUMN: nested field '${r.fieldNames().mkString(".")}' " +
          "is not supported — rename a top-level column")
      TsTable.open(spark, pathOf(ident))
        .renameColumn(r.fieldNames()(0), r.newName())
    } else if (adds.nonEmpty) {
      val fields = adds.map { a =>
        require(a.fieldNames().length == 1,
          s"graft-ts ADD COLUMNS: nested field '${a.fieldNames().mkString(".")}' " +
            "is not supported — add a top-level column")
        StructField(a.fieldNames()(0), a.dataType(), nullable = true)
      }
      TsTable.open(spark, pathOf(ident)).addColumns(fields)
    } else {
      val names = drops.map { d =>
        require(d.fieldNames().length == 1,
          s"graft-ts DROP COLUMNS: nested field '${d.fieldNames().mkString(".")}' " +
            "is not supported — drop a top-level column")
        d.fieldNames()(0)
      }
      TsTable.open(spark, pathOf(ident)).dropColumns(names)
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "refusing to drop a path-addressed graft-ts store through SQL; " +
        "delete the directory explicitly if that is really what you want")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "a graft-ts table's identity IS its path; move the directory " +
        "explicitly to rename it")
}
