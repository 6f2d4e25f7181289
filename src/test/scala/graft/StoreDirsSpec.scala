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
    // stable resolves the same namespace but never wipes
    f.mkdirs()
    new java.io.File(f, "kept").createNewFile()
    assert(StoreDirs.stable(spark, "graft_storedirs_spec") == p)
    assert(new java.io.File(f, "kept").exists())
  }

  test("scratch paths are namespaced per session and keyed full-width") {
    // per-process namespace: concurrent sessions sharing one root must not
    // wipe each other's stores (r9 advice) — the path carries a session tag
    val p = StoreDirs.scratch(spark, "graft_storedirs_ns")
    assert(new java.io.File(p).getParentFile.getName.startsWith("graft-scratch-"))
    // pathKey: full-width digest, not 32-bit String.hashCode — distinct
    // dirs map to distinct keys and the key is stable across JVMs
    val k1 = StoreDirs.pathKey("/data/a")
    assert(k1 != StoreDirs.pathKey("/data/b") && k1.length == 16)
    assert(k1 == StoreDirs.pathKey("/data/a"))
  }

  test("orphan sweep spares an idle namespace whose owner process is alive, " +
      "sweeps one with a dead owner") {
    val sharedRoot = java.nio.file.Files.createTempDirectory("graft_sweep").toString
    val host = java.net.InetAddress.getLocalHost.getHostName
    def fakeNs(name: String, pid: Long): java.io.File = {
      val d = new java.io.File(sharedRoot, name)
      d.mkdirs()
      val w = new java.io.FileWriter(new java.io.File(d, "_owner.lock"))
      try w.write(s"$host:$pid") finally w.close()
      // idle for 8 days — past the 7-day sweep cutoff
      d.setLastModified(System.currentTimeMillis() - 8L * 24 * 3600 * 1000)
      d
    }
    val live = fakeNs("graft-scratch-livetest", ProcessHandle.current().pid())
    val deadPid = Iterator.from(100000)
      .find(p => ProcessHandle.of(p.toLong).isEmpty).get.toLong
    val dead = fakeNs("graft-scratch-deadtest", deadPid)
    // pid-recycling guard: OUR pid is alive, but a lock written long before
    // this JVM started can only be a previous life of the number — swept
    val recycled = fakeNs("graft-scratch-recycled", ProcessHandle.current().pid())
    val jvmStart = ProcessHandle.current().info().startInstant()
      .map[Long](_.toEpochMilli).orElse(System.currentTimeMillis())
    new java.io.File(recycled, "_owner.lock")
      .setLastModified(jvmStart - 30L * 24 * 3600 * 1000)
    spark.conf.set("spark.graft.store.dir", sharedRoot)
    try {
      StoreDirs.sessionRoot(spark) // first use under this root → sweep runs
      assert(live.exists(), "sweep deleted a namespace with a LIVE owner")
      assert(!dead.exists(), "sweep spared a dead-owner namespace")
      assert(!recycled.exists(), "sweep spared a recycled-pid namespace")
      // and the fresh namespace records its own owner for future sweeps
      val ns = new java.io.File(StoreDirs.sessionRoot(spark).toString)
      assert(new java.io.File(ns, "_owner.lock").exists())
    } finally spark.conf.unset("spark.graft.store.dir")
  }

  test("spark.graft.store.dir redirects roundtrip stores (cluster shared-dir knob)") {
    val shared = java.nio.file.Files.createTempDirectory("graft_shared").toString
    spark.conf.set("spark.graft.store.dir", shared)
    try {
      assert(StoreDirs.root(spark) == shared)
      val n = TimeSeriesPack.appendRoundtrip(spark, sf0001).count()
      assert(n > 0)
      val stores = new java.io.File(shared).listFiles()
        .filter(_.getName.startsWith("graft-scratch-"))
        .flatMap(_.listFiles())
        .filter(_.getName.startsWith("graft_tstable_rt_"))
      assert(stores.nonEmpty, s"no store under $shared")
    } finally spark.conf.unset("spark.graft.store.dir")
  }
}
