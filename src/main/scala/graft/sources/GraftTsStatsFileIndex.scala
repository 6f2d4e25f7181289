package graft.sources

import graft.ts.TsTable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal, XxHash64}
import org.apache.spark.sql.execution.datasources.{FileStatusCache, InMemoryFileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{StructType, TimestampType}

/** The live V2 file index with MANIFEST-LEVEL file skipping: the standard
  * directory-listing index (membership stays listing-driven — the live
  * read's contract), except that `listFiles` consults the current
  * manifest's per-file ts spans (footer stats recorded at commit,
  * [[TsTable]] manifests) and drops files whose closed span cannot
  * intersect the scan's pushed ts bounds.
  *
  * Why this matters at 100 TB: partition pruning already skips whole DAYS,
  * and parquet row-group stats skip within a file at read time — but every
  * surviving file still becomes planner work (split enumeration, a task,
  * a footer RPC). A day holding many files with disjoint ts slices
  * (`filesPerDay > 1` writes, pre-compaction append runs) plans them ALL
  * for a narrow in-day range. The span index removes them at PLANNING
  * time, driver-side, zero I/O — the Iceberg/Delta data-skipping argument
  * applied to the one column this format orders by.
  *
  * Soundness: a file missing from the span map is always kept (pre-stats
  * manifests, foreign encodings, orphans not yet committed), and bound
  * extraction is conservative (strict bounds widen to closed; anything
  * unrecognized contributes nothing). Skipping only ever removes files
  * whose recorded [min, max] provably cannot match — and spans never go
  * stale because data files are immutable under UUID names (a rewrite
  * produces NEW names; a restore copies back byte-identical content). */
final class GraftTsStatsFileIndex(
    spark: SparkSession,
    rootPath: Path,
    userSchema: StructType,
    spans: Map[String, (Long, Long)],
    tsCol: String,
    colSpans: Map[String, Map[String, graft.ts.ColSpan]] = Map.empty,
    blooms: Map[String, Map[String, Array[Byte]]] = Map.empty)
  extends InMemoryFileIndex(spark, Seq(rootPath), Map.empty[String, String],
    Some(userSchema), FileStatusCache.getOrCreate(spark), None, None) {

  // the listing serves QUALIFIED paths — key the span maps the same way
  private lazy val qualify: String => String = {
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    rel => fs.makeQualified(new Path(rootPath, rel)).toString
  }

  private lazy val byPath: Map[String, (Long, Long)] =
    spans.map { case (rel, span) => qualify(rel) -> span }

  private lazy val colByPath: Map[String, Map[String, graft.ts.ColSpan]] =
    colSpans.map { case (rel, cs) => qualify(rel) -> cs }

  // every column any file has a recorded span for (statsCols, effectively)
  private lazy val statCols: Seq[String] =
    colSpans.valuesIterator.flatMap(_.keysIterator).toSet.toSeq

  // deserialized once per index instance (a fresh Table — every load() —
  // gets a fresh index); O(#files × bits/8) driver memory while planning
  private lazy val bloomByPath
      : Map[String, Map[String, org.apache.spark.util.sketch.BloomFilter]] =
    blooms.map { case (rel, cols) =>
      qualify(rel) -> cols.map { case (c, bytes) =>
        c -> org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(bytes))
      }
    }

  private lazy val bloomCols: Seq[String] =
    blooms.valuesIterator.flatMap(_.keysIterator).toSet.toSeq

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val dirs = super.listFiles(partitionFilters, dataFilters)
    if (byPath.isEmpty && colByPath.isEmpty && bloomByPath.isEmpty) return dirs
    val (lo, hi) = GraftTsStatsFileIndex.tsBounds(dataFilters, tsCol)
    // bounds per stats column, from the same pushed conjuncts
    val colBounds = statCols.flatMap { c =>
      val b = GraftTsStatsFileIndex.numBounds(dataFilters, c)
      if (b._1.isEmpty && b._2.isEmpty) None else Some((c, b._1, b._2))
    }
    // per-conjunct equality probe hashes on bloom-indexed columns — a file
    // must might-contain at least one hash of EVERY equality conjunct
    val bloomProbes = bloomCols.flatMap { c =>
      GraftTsStatsFileIndex.eqProbeHashes(dataFilters, c).map(c -> _)
    }
    if (lo.isEmpty && hi.isEmpty && colBounds.isEmpty && bloomProbes.isEmpty)
      return dirs
    dirs.map { pd =>
      pd.copy(files = pd.files.filter { f =>
        val p = f.getPath.toString
        val tsKeep = byPath.get(p) match {
          case Some((mn, mx)) => lo.forall(mx >= _) && hi.forall(mn <= _)
          case None => true // no span recorded → never skip
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
            case None => true // no bits recorded → never skip
          }
        }
      })
    }
  }
}

object GraftTsStatsFileIndex {

  /** Closed [lo, hi] µs bounds implied by the scan's top-level ts
    * conjuncts (either operand order). Strict comparisons widen to their
    * closed form — a file whose span touches the bound exactly is kept
    * even though its edge rows may not match; conservative by
    * construction, mirroring [[GraftTsScanBuilder.derivedDateBounds]]. */
  private[sources] def tsBounds(filters: Seq[Expression],
                                tsCol: String): (Option[Long], Option[Long]) = {
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    def tightenLo(v: Long): Unit = lo = Some(lo.fold(v)(math.max(_, v)))
    def tightenHi(v: Long): Unit = hi = Some(hi.fold(v)(math.min(_, v)))
    def isTs(e: Expression): Boolean = e match {
      case a: AttributeReference =>
        a.name.equalsIgnoreCase(tsCol) && a.dataType == TimestampType
      case _ => false
    }
    filters.foreach {
      case GreaterThanOrEqual(a, Literal(us: Long, TimestampType)) if isTs(a) =>
        tightenLo(us)
      case GreaterThan(a, Literal(us: Long, TimestampType)) if isTs(a) =>
        tightenLo(us)
      case LessThanOrEqual(a, Literal(us: Long, TimestampType)) if isTs(a) =>
        tightenHi(us)
      case LessThan(a, Literal(us: Long, TimestampType)) if isTs(a) =>
        tightenHi(us)
      case EqualTo(a, Literal(us: Long, TimestampType)) if isTs(a) =>
        tightenLo(us); tightenHi(us)
      case EqualTo(Literal(us: Long, TimestampType), a) if isTs(a) =>
        tightenLo(us); tightenHi(us)
      // an IN probe set (static, or a runtime join-key filter) implies the
      // closed [min, max] of its values — conservative: any non-conforming
      // member voids the whole conjunct's contribution
      case In(a, list) if isTs(a) && list.nonEmpty && list.forall {
            case Literal(_: Long, TimestampType) => true; case _ => false } =>
        val us = list.map { case Literal(v: Long, TimestampType) => v }
        tightenLo(us.min); tightenHi(us.max)
      case GreaterThanOrEqual(Literal(us: Long, TimestampType), a) if isTs(a) =>
        tightenHi(us)
      case GreaterThan(Literal(us: Long, TimestampType), a) if isTs(a) =>
        tightenHi(us)
      case LessThanOrEqual(Literal(us: Long, TimestampType), a) if isTs(a) =>
        tightenLo(us)
      case LessThan(Literal(us: Long, TimestampType), a) if isTs(a) =>
        tightenLo(us)
      case _ => ()
    }
    (lo, hi)
  }

  /** Equality probe HASH-SETS on `name` implied by the scan's top-level
    * conjuncts, one entry per `=` / `IN` conjunct (each prunes
    * independently: the row set needs every conjunct true, so a file must
    * might-contain at least one value of each). Hashes are xxhash64
    * (seed 42) of the CATALYST-internal literal under the column's own
    * type — exactly the build-side `functions.xxhash64(col)` contract —
    * and only literals already of the column's type participate (a
    * comparison Catalyst chose to cast differently contributes nothing:
    * conservative). Null values never hash (SQL equality with null never
    * matches a stored row); a conjunct left with NO hashable values
    * contributes nothing rather than pruning everything. */
  private[sources] def eqProbeHashes(filters: Seq[Expression],
                                     name: String): Seq[Seq[Long]] = {
    def hash(v: Any, dt: org.apache.spark.sql.types.DataType): Option[Long] =
      if (v == null) None
      else Some(new XxHash64(Seq(Literal(v, dt))).eval(null).asInstanceOf[Long])
    filters.flatMap {
      case EqualTo(a: AttributeReference, l @ Literal(v, _))
          if a.name.equalsIgnoreCase(name) && l.dataType == a.dataType =>
        hash(v, a.dataType).map(Seq(_))
      case EqualTo(l @ Literal(v, _), a: AttributeReference)
          if a.name.equalsIgnoreCase(name) && l.dataType == a.dataType =>
        hash(v, a.dataType).map(Seq(_))
      case In(a: AttributeReference, list)
          if a.name.equalsIgnoreCase(name) && list.forall(e =>
            e.isInstanceOf[Literal] && e.dataType == a.dataType) =>
        val hs = list.flatMap { case Literal(v, _) => hash(v, a.dataType) }
        if (hs.nonEmpty) Some(hs) else None
      case InSet(a: AttributeReference, hset)
          if a.name.equalsIgnoreCase(name) =>
        val hs = hset.toSeq.flatMap(v => hash(v, a.dataType))
        if (hs.nonEmpty) Some(hs) else None
      case _ => None
    }
  }

  /** Closed [lo, hi] BigDecimal bounds implied on a NUMERIC stats column
    * by the scan's top-level conjuncts — the generic sibling of
    * [[tsBounds]] (strict widens to closed, unrecognized shapes
    * contribute nothing; BigDecimal so integral spans never round). */
  private[sources] def numBounds(filters: Seq[Expression], name: String)
      : (Option[BigDecimal], Option[BigDecimal]) = {
    var lo: Option[BigDecimal] = None
    var hi: Option[BigDecimal] = None
    def tightenLo(v: BigDecimal): Unit = lo = Some(lo.fold(v)(_.max(v)))
    def tightenHi(v: BigDecimal): Unit = hi = Some(hi.fold(v)(_.min(v)))
    def isCol(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name.equalsIgnoreCase(name)
      case _ => false
    }
    def num(l: Any): Option[BigDecimal] = l match {
      case v: Long => Some(BigDecimal(v))
      case v: Int => Some(BigDecimal(v))
      case v: Short => Some(BigDecimal(v.toInt))
      case v: Byte => Some(BigDecimal(v.toInt))
      case v: Double if java.lang.Double.isFinite(v) => Some(BigDecimal(v))
      case v: Float if java.lang.Float.isFinite(v) => Some(BigDecimal(v.toDouble))
      case v: org.apache.spark.sql.types.Decimal => Some(v.toBigDecimal)
      case _ => None
    }
    filters.foreach {
      case GreaterThanOrEqual(a, Literal(v, _)) if isCol(a) => num(v).foreach(tightenLo)
      case GreaterThan(a, Literal(v, _)) if isCol(a) => num(v).foreach(tightenLo)
      case LessThanOrEqual(a, Literal(v, _)) if isCol(a) => num(v).foreach(tightenHi)
      case LessThan(a, Literal(v, _)) if isCol(a) => num(v).foreach(tightenHi)
      case EqualTo(a, Literal(v, _)) if isCol(a) =>
        num(v).foreach { b => tightenLo(b); tightenHi(b) }
      case EqualTo(Literal(v, _), a) if isCol(a) =>
        num(v).foreach { b => tightenLo(b); tightenHi(b) }
      // IN probe set → closed [min, max] (the tsBounds rule); all-or-nothing
      // so a partially-numeric list contributes nothing
      case In(a, list) if isCol(a) && list.nonEmpty &&
          list.forall(_.isInstanceOf[Literal]) =>
        val bs = list.map { case Literal(v, _) => num(v) }
        if (bs.forall(_.isDefined)) {
          val vals = bs.map(_.get)
          tightenLo(vals.min); tightenHi(vals.max)
        }
      case GreaterThanOrEqual(Literal(v, _), a) if isCol(a) => num(v).foreach(tightenHi)
      case GreaterThan(Literal(v, _), a) if isCol(a) => num(v).foreach(tightenHi)
      case LessThanOrEqual(Literal(v, _), a) if isCol(a) => num(v).foreach(tightenLo)
      case LessThan(Literal(v, _), a) if isCol(a) => num(v).foreach(tightenLo)
      case _ => ()
    }
    (lo, hi)
  }
}
