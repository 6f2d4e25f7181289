package org.apache.spark.sql.graft

import org.scalatest.funsuite.AnyFunSuite

/** The archive↔live path mirror is pure string surgery over the format's
  * fixed layout — pin every shape so a layout change can't silently break
  * execution-time resolution. */
class MirrorPathSpec extends AnyFunSuite {

  private def m(p: String): Option[String] =
    ArchiveResolvingParquetFileFormat.mirrorPath(p)

  test("live partitioned file mirrors into the archive") {
    assert(m("file:/data/t/p_date=2024-01-01/part-0.parquet")
      .contains("file:/data/t/_ts_archive/p_date=2024-01-01/part-0.parquet"))
  }

  test("archived partitioned file mirrors back to the live tree") {
    assert(m("file:/data/t/_ts_archive/p_date=2024-01-01/part-0.parquet")
      .contains("file:/data/t/p_date=2024-01-01/part-0.parquet"))
  }

  test("loose root-level file mirrors under the archive root") {
    assert(m("file:/data/t/part-0.parquet")
      .contains("file:/data/t/_ts_archive/part-0.parquet"))
    assert(m("file:/data/t/_ts_archive/part-0.parquet")
      .contains("file:/data/t/part-0.parquet"))
  }

  test("a path with p_date deeper than the table root splits at the LAST p_date segment") {
    assert(m("/a/p_date=x/t/p_date=2024-01-01/f.parquet")
      .contains("/a/p_date=x/t/_ts_archive/p_date=2024-01-01/f.parquet"))
  }

  test("degenerate paths return None rather than a wrong mirror") {
    assert(m("f.parquet").isEmpty)
  }
}
