package graft

import graft.operators.{StoreDirs, TimeSeriesPack}

/** The scratch-store root is a tested runtime parameter (r8 verdict's
  * "silent shared-filesystem assumption"): spark.graft.store.dir redirects
  * every roundtrip/index store, default stays java.io.tmpdir. */
class StoreDirsSpec extends SparkSpec {

  test("default root is java.io.tmpdir; scratch wipes an existing dir") {
    assert(StoreDirs.root(spark) == sys.props("java.io.tmpdir"))
    val p = StoreDirs.scratch(spark, "graft_storedirs_spec")
    val f = new java.io.File(p)
    f.mkdirs()
    new java.io.File(f, "stale").createNewFile()
    val again = StoreDirs.scratch(spark, "graft_storedirs_spec")
    assert(again == p && !new java.io.File(f, "stale").exists())
  }

  test("spark.graft.store.dir redirects roundtrip stores (cluster shared-dir knob)") {
    val shared = java.nio.file.Files.createTempDirectory("graft_shared").toString
    spark.conf.set("spark.graft.store.dir", shared)
    try {
      assert(StoreDirs.root(spark) == shared)
      val n = TimeSeriesPack.appendRoundtrip(spark, sf0001).count()
      assert(n > 0)
      val stores = new java.io.File(shared).listFiles()
        .filter(_.getName.startsWith("graft_tstable_rt_"))
      assert(stores.nonEmpty, s"no store under $shared")
    } finally spark.conf.unset("spark.graft.store.dir")
  }
}
