package graft

import java.sql.Timestamp

import graft.functions.TextFns
import graft.streaming.DocStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Doc(doc_id: Long, ts: Timestamp, lang: String, text: String)

/** The live corpus gate (DocStream.corpusStream): batch parity of the
  * quality filter, first-arrival exact dedup within the watermark, and
  * bounded-state plumbing — on chunked MemoryStream replay of the real
  * documents fixture. */
class DocStreamSpec extends SparkSpec {

  private def fixtureDocs(n: Int): Seq[Doc] = {
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text"))
      .orderBy(col("doc_id")).limit(n).collect()
      .map(r => Doc(r.getLong(0),
        new Timestamp(base + r.getLong(0) * 60000L), // one doc per minute
        r.getString(1), r.getString(2)))
      .toSeq
  }

  test("streaming corpus gate == batch quality filter on chunked replay; " +
      "duplicate content within the watermark keeps the first arrival") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val originals = fixtureDocs(200)
    // batch truth: the SAME gate the stream reuses (parity by construction
    // is the claim; this asserts it survives watermarking + chunking)
    val wantIds = graft.operators.PipelinePack
      .qualityGate(originals.toDF())
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(wantIds.nonEmpty && wantIds.size < 200) // the gate actually gates

    // inject exact-duplicate CONTENT: new doc_ids, arriving 5 minutes
    // after their originals — inside the 1 hour watermark, so the dedup
    // must drop every one of them
    val survivors = originals.filter(d => wantIds.contains(d.doc_id))
    val dups = survivors.take(20).map(d =>
      d.copy(doc_id = d.doc_id + 10000L,
        ts = new Timestamp(d.ts.getTime + 5 * 60000L)))
    val rows = (originals ++ dups).sortBy(_.ts.getTime)

    val ms = MemoryStream[Doc]
    val q = DocStream.corpusStream(ms.toDF(), "ts", "1 hour")
      .select($"doc_id", $"lang", $"n_tokens", $"content_sha")
      .writeStream.format("memory").queryName("corpus_gate")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length / 5).max(1)).foreach { chunk =>
        ms.addData(chunk); q.processAllAvailable()
      }
      val got = spark.table("corpus_gate").collect()
      val gotIds = got.map(_.getLong(0)).toSet
      // every quality survivor present, every injected duplicate dropped,
      // every quality-reject absent
      assert(gotIds == wantIds,
        s"missing=${wantIds -- gotIds} unexpected=${gotIds -- wantIds}")
      // one row per distinct content
      assert(got.map(_.getString(3)).distinct.length == got.length)
      // signals ride through with batch values
      val batchTok = graft.operators.PipelinePack
        .qualityGate(originals.toDF())
        .select("doc_id", "n_tokens").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got.forall(r => batchTok(r.getLong(0)) == r.getInt(2)))
    } finally q.stop()
  }

  test("re-arrival BEYOND the watermark horizon is a new document (state " +
      "is evicted by event time, not corpus-proportional)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val text = "the quick brown fox jumps over the lazy dog again and again today"
    val t0 = Timestamp.valueOf("2024-03-01 00:00:00")
    val ms = MemoryStream[Doc]
    val q = DocStream.corpusStream(ms.toDF(), "ts", "10 minutes")
      .select($"doc_id").writeStream.format("memory")
      .queryName("corpus_gate_horizon").outputMode("append").start()
    try {
      ms.addData(Doc(1L, t0, "en", text)); q.processAllAvailable()
      // same content 2 min later: inside horizon -> dropped
      ms.addData(Doc(2L, new Timestamp(t0.getTime + 2 * 60000L), "en", text))
      q.processAllAvailable()
      // advance the watermark far past the horizon, then re-arrive
      ms.addData(Doc(3L, new Timestamp(t0.getTime + 3600 * 1000L), "en",
        "completely different content that still passes the quality gate fine"))
      q.processAllAvailable()
      ms.addData(Doc(4L, new Timestamp(t0.getTime + 3620 * 1000L), "en", text))
      q.processAllAvailable()
      val ids = spark.table("corpus_gate_horizon").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L, 4L), ids.toString) // 2 deduped, 4 re-admitted
    } finally q.stop()
  }

  test("streaming near-dup pairs == batch minhashLsh pairs on chunked replay " +
      "of a planted corpus") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // Planted corpus: fixture docs with the fixture's OWN near-dup plants
    // removed (the regenerated testdata ships genuine near-duplicate
    // groups — e.g. docs 0/50/82 — which would make "expected pairs"
    // fixture-content-dependent), plus, for every 10th survivor, a
    // LATER-arriving near-identical variant (first token changed —
    // Jaccard ≈ 0.95 against its source).
    val raw = fixtureDocs(100)
    val fixtureDupIds = graft.operators.NearDedup.minhashLsh(
        raw.toDF().withColumn("part", lit(0)),
        idCol = "doc_id", textCol = "text", partCol = "part", tau = 0.5)
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val originals = raw.filterNot(d => fixtureDupIds.contains(d.doc_id))
    val variants = originals.filter(_.doc_id % 10 == 0).map { d =>
      d.copy(doc_id = d.doc_id + 5000L,
        ts = new Timestamp(d.ts.getTime + 7 * 60000L),
        text = "variant " + d.text.split("\\s+", 2).last)
    }
    assert(variants.nonEmpty)
    val rows = (originals ++ variants).sortBy(d => (d.ts.getTime, d.doc_id))

    // batch truth on the SAME banding parameters; minhashLsh verifies on
    // exact Jaccard where the stream uses the signature estimate — the
    // planted pairs (J≈0.95) and fixture noise (J≈0.06) both sit many
    // estimator-σ from τ=0.5, so the pair sets must agree exactly
    val batchPairs = graft.operators.NearDedup.minhashLsh(
        rows.toDF().withColumn("part", lit(0)),
        idCol = "doc_id", textCol = "text", partCol = "part", tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs == variants.map(v => (v.doc_id - 5000L, v.doc_id)).toSet,
      s"batch truth unexpected: $batchPairs")

    val ms = MemoryStream[Doc]
    val q = DocStream.nearDupPairsStream(ms.toDF(), "doc_id", "ts", "text",
        watermark = "1 hour", tau = 0.5)
      .writeStream.format("memory").queryName("near_pairs")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length / 7).max(1)).foreach { chunk =>
        ms.addData(chunk); q.processAllAvailable()
      }
      val got = spark.table("near_pairs").collect()
      val gotPairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gotPairs == batchPairs,
        s"missing=${batchPairs -- gotPairs} extra=${gotPairs -- batchPairs}")
      // ordering contract: a_id is always the earlier arrival
      assert(got.forall(r => r.getLong(0) < r.getLong(1)))
      // estimates on planted near-identical pairs are high
      assert(got.forall(_.getDouble(3) >= 0.5))
    } finally q.stop()
  }

  test("near-dup stream: horizon evicts state — a variant arriving past the " +
      "horizon is NOT paired; chunk boundaries don't change emissions") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-03-01 00:00:00")
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      Doc(1L, t0, "en", base),
      // inside the 10-min horizon → pair (1, 2)
      Doc(2L, new Timestamp(t0.getTime + 5 * 60000L), "en", "variant " + base.split(" ", 2).last),
      // same content again but 30 min after doc 1 → entry evicted, no pair
      // with 1; still pairs with 2? — 25 min after doc 2, also beyond horizon
      Doc(3L, new Timestamp(t0.getTime + 30 * 60000L), "en", "other " + base.split(" ", 2).last))

    def run(chunks: Seq[Seq[Doc]], name: String): Set[(Long, Long)] = {
      val ms = MemoryStream[Doc]
      val q = DocStream.nearDupPairsStream(ms.toDF(), "doc_id", "ts", "text",
          watermark = "10 minutes", tau = 0.5, horizonMs = 10 * 60000L)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
        spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      } finally q.stop()
    }
    val oneShot = run(Seq(docs), "near_h1")
    val chunked = run(docs.map(Seq(_)), "near_h2")
    assert(oneShot == Set((1L, 2L)), oneShot.toString)
    assert(chunked == oneShot, s"replay-dependent emissions: $chunked vs $oneShot")
  }

  test("streaming containment pairs == batch containmentPairs on chunked " +
      "replay of a size-comparable planted corpus; the documented " +
      "small-in-big miss regime IS missed") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-03-01 00:00:00")
    // 30 disjoint-vocabulary base docs; every 3rd gets a LATER container
    // variant = the full original plus 15 new tokens (ρ ≈ 1.4 — J ≈ 0.7,
    // well inside banded recall) — the quoted-with-commentary case.
    val bases = (0 until 30).map { i =>
      Doc(i.toLong, new Timestamp(t0.getTime + i * 60000L), "en",
        (1 to 40).map(j => s"w${i}_$j").mkString(" "))
    }
    val containers = bases.filter(_.doc_id % 3 == 0).map { d =>
      Doc(d.doc_id + 1000L, new Timestamp(d.ts.getTime + 10 * 60000L), "en",
        d.text + " " + (1 to 15).map(j => s"x${d.doc_id}_$j").mkString(" "))
    }
    // the known-miss regime: a 12-token doc verbatim inside a 400-token
    // doc (ρ ≈ 30, J ≈ 0.03 — banded buckets cannot collide)
    val bigBody = (1 to 400).map(j => s"big_$j").mkString(" ")
    val smallInBig = Seq(
      Doc(9000L, new Timestamp(t0.getTime + 40 * 60000L), "en",
        (100 to 111).map(j => s"big_$j").mkString(" ")),
      Doc(9001L, new Timestamp(t0.getTime + 41 * 60000L), "en", bigBody))
    val rows = (bases ++ containers ++ smallInBig)
      .sortBy(d => (d.ts.getTime, d.doc_id))

    val batchPairs = graft.operators.NearDedup.containmentPairs(
        rows.toDF(), idCol = "doc_id", textCol = "text", partCol = "lang",
        tauC = 0.9, minShingles = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = containers.map(c => (c.doc_id - 1000L, c.doc_id)).toSet
    assert(batchPairs == planted + ((9000L, 9001L)),
      s"batch truth unexpected: $batchPairs")

    def run(chunks: Seq[Seq[Doc]], name: String): Set[(Long, Long)] = {
      val ms = MemoryStream[Doc]
      val q = DocStream.containmentPairsStream(ms.toDF(), "doc_id", "ts",
          "text", watermark = "1 hour", tauC = 0.9)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
        spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      } finally q.stop()
    }
    val got = run(rows.grouped((rows.length / 5).max(1)).toSeq, "contain_pairs")
    // every size-comparable batch pair found, canonically oriented...
    assert(got == planted,
      s"missing=${planted -- got} extra=${got -- planted}")
    // ...and the asserted divergence: the small-in-big pair (which the
    // batch pigeonhole join finds) is structurally missed by banded state
    assert(!got.contains((9000L, 9001L)),
      "banded buckets must not recall J≈0.03 containment — if this fires, " +
        "update the recall scaladoc")
    // chunk-boundary invariance
    val oneShot = run(Seq(rows), "contain_pairs_os")
    assert(oneShot == got, s"replay-dependent emissions: $oneShot vs $got")
  }

  test("streaming decontamination: chunked replay == the identical batch " +
      "predicate; planted benchmark copies blocked; kept docs share no shingle") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val originals = fixtureDocs(200)
    val bench = originals.filter(_.doc_id % 50 == 0)
    val train = originals.filter(_.doc_id % 50 != 0)
    // contaminated arrivals: benchmark text under fresh ids
    val planted = bench.take(3).zipWithIndex.map { case (d, i) =>
      d.copy(doc_id = 30000L + i) }
    val rows = (train ++ planted).sortBy(_.ts.getTime)
    val benchDf = bench.toDF()

    // batch truth: the SAME function applied to the same rows as one batch
    val batchKept = DocStream.decontaminateStream(rows.toDF(), benchDf)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val ms = MemoryStream[Doc]
    val q = DocStream.decontaminateStream(ms.toDF(), benchDf)
      .select($"doc_id").writeStream.format("memory")
      .queryName("decon_stream").outputMode("append").start()
    try {
      rows.grouped(40).foreach { chunk =>
        ms.addData(chunk); q.processAllAvailable()
      }
      val got = spark.table("decon_stream").collect().map(_.getLong(0)).toSet
      assert(got == batchKept,
        s"missing=${batchKept -- got} unexpected=${got -- batchKept}")
      // exact benchmark copies must be blocked (no false negatives)
      assert(planted.forall(d => !got.contains(d.doc_id)))
      assert(got.nonEmpty && got.size < rows.size) // the gate discriminates
      // Bloom misses are impossible: every kept doc shares NO shingle
      val benchSh = benchDf
        .select(explode(TextFns.shingles3(col("text"))).as("sh"))
        .distinct().collect().map(_.getString(0)).toSet
      val keptTexts = rows.filter(d => got.contains(d.doc_id))
      keptTexts.foreach { d =>
        val sh = d.text.trim.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
        assert(sh.intersect(benchSh).isEmpty, s"doc ${d.doc_id} kept but overlaps")
      }
    } finally q.stop()
  }

  test("embedding-decontamination stream == the batch gate on chunked replay; " +
      "flagged set matches q_decontaminate_embed's complement") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val bench = emb.filter(_._1 % 41 == 7)
    val corpus = emb.filter(_._1 % 41 != 7)
    val benchDf = bench.toSeq.toDF("vec_id", "embedding")
    // a null-vector row must PASS the gate un-flagged in BOTH engines:
    // cosine is null, exists() is null under three-valued logic, and the
    // batch key's (sim >= tau IS NULL -> false) keeps the row — the
    // stream's coalesce(hit, false) pins the same semantics
    val nullRow = (-1L, null: Seq[Double])
    val corpusPlus = corpus :+ nullRow
    // batch truth #1: the same stateless predicate on a batch frame
    val batchKept = DocStream.decontaminateEmbedStream(
        corpusPlus.toSeq.toDF("vec_id", "embedding"), benchDf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(batchKept.contains(-1L),
      "null-embedding row must pass the gate un-flagged (batch parity)")
    // batch truth #2: the registered key flags exactly the complement
    val flagged = graft.operators.LlmPack.decontaminateEmbed(spark, sf0001)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(batchKept.intersect(flagged).isEmpty)
    assert((batchKept - -1L) ++ flagged == corpus.map(_._1).toSet)
    val ms = MemoryStream[(Long, Seq[Double])]
    val q = DocStream.decontaminateEmbedStream(
        ms.toDF().toDF("vec_id", "embedding"), benchDf)
      .select($"vec_id").writeStream.format("memory")
      .queryName("decon_embed_stream").outputMode("append").start()
    try {
      corpusPlus.grouped(40).foreach { chunk =>
        ms.addData(chunk.toSeq); q.processAllAvailable()
      }
      val got = spark.table("decon_embed_stream").collect()
        .map(_.getLong(0)).toSet
      assert(got == batchKept,
        s"missing=${batchKept -- got} unexpected=${got -- batchKept}")
      assert(flagged.nonEmpty && got.nonEmpty) // the gate discriminates
    } finally q.stop()
    // the misuse guard refuses an oversized benchmark loudly
    val e = intercept[IllegalArgumentException] {
      DocStream.decontaminateEmbedStream(
        corpus.toSeq.toDF("vec_id", "embedding"), benchDf,
        maxBenchVectors = bench.length - 1)
    }
    assert(e.getMessage.contains("IVF"))
  }

  test("the live corpus gate composes: decontaminate -> quality -> dedup " +
      "in ONE streaming query equals the batch chain") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val originals = fixtureDocs(150)
    val bench = originals.filter(_.doc_id % 50 == 0)
    val train = originals.filter(_.doc_id % 50 != 0)
    val benchDf = bench.toDF()
    // batch truth: same composition, batch inputs
    val wantIds = graft.operators.PipelinePack.qualityGate(
        DocStream.decontaminateStream(train.toDF(), benchDf))
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val ms = MemoryStream[Doc]
    val q = DocStream.corpusStream(
        DocStream.decontaminateStream(ms.toDF(), benchDf), "ts", "1 hour")
      .select($"doc_id").writeStream.format("memory")
      .queryName("gate_composed").outputMode("append").start()
    try {
      train.sortBy(_.ts.getTime).grouped(30).foreach { chunk =>
        ms.addData(chunk); q.processAllAvailable()
      }
      val got = spark.table("gate_composed").collect().map(_.getLong(0)).toSet
      // fixture texts are distinct, so the dedup stage drops nothing and
      // the composed stream must equal the batch filter chain exactly
      assert(got == wantIds,
        s"missing=${wantIds -- got} unexpected=${got -- wantIds}")
      assert(got.nonEmpty && got.size < train.size)
    } finally q.stop()
  }

  test("live ingest gate: probe -> admit -> append through the signature " +
      "store == the same loop run as sequential batches") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.SigStore

    val all = fixtureDocs(300)
    // corpus = first 200 docs; the "stream" = the remaining 100 plus
    // planted offenders: copies of a corpus doc AND of an earlier stream
    // doc (so both the store path and the within-loop path must fire)
    val (corpusDocs, rest) = all.splitAt(200)
    val streamDocs = (rest ++ Seq(
      corpusDocs.head.copy(doc_id = 40001L),
      rest.head.copy(doc_id = 40002L))).sortBy(_.doc_id)
    val chunks = streamDocs.grouped(26).map(_.toSeq).toSeq

    def newStore(tag: String): String = {
      val p = java.nio.file.Files
        .createTempDirectory(s"graft-ingest-$tag").toString + "/sig"
      assert(SigStore.buildIfNeeded(corpusDocs.toDF(), p, tag,
        "doc_id", "text", "lang"))
      p
    }

    // batch truth: the same loop, chunk by chunk
    val batchStore = newStore("batch")
    val wantAdmitted = scala.collection.mutable.Set[Long]()
    chunks.foreach { chunk =>
      val offenders = SigStore.probe(batchStore, chunk.toDF(),
          "doc_id", "text", "lang", tau = 0.8)
        .select("new_id").collect().map(_.getLong(0)).toSet
      val admitted = chunk.filter(d => !offenders.contains(d.doc_id))
      wantAdmitted ++= admitted.map(_.doc_id)
      SigStore.append(batchStore, admitted.toDF(), "doc_id", "text", "lang")
    }

    val streamStore = newStore("stream")
    val got = scala.collection.mutable.Set[Long]()
    val ms = MemoryStream[Doc]
    val q = DocStream.ingestGateSink(ms.toDF(), streamStore,
        "doc_id", "text", "lang", tau = 0.8) { adm =>
        got ++= adm.select("doc_id").collect().map(_.getLong(0))
      }.start()
    try {
      chunks.foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
      assert(got.toSet == wantAdmitted.toSet,
        s"missing=${wantAdmitted -- got} extra=${got -- wantAdmitted}")
      // the gate must actually reject something on the planted fixture
      assert(got.size < streamDocs.size, "nothing was rejected")
      // appended docs are probe-visible: re-probing an admitted doc's
      // exact text now reports a match against the stream store
      val probeBack = SigStore.probe(streamStore,
        streamDocs.filter(d => got.contains(d.doc_id)).take(1)
          .map(d => d.copy(doc_id = 90000L)).toDF(),
        "doc_id", "text", "lang", tau = 0.8).collect()
      assert(probeBack.nonEmpty, "admitted doc not visible to later probes")
    } finally q.stop()
  }

  test("ingest gate's downstream TsTable restored mid-stream: the stream " +
      "continues, the table rolls back but the gate's memory does not, " +
      "and history stays linear") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.SigStore
    import graft.ts.TsTable
    import org.apache.spark.sql.types.{LongType, StructField, StructType, TimestampType}

    val all = fixtureDocs(120)
    val (corpusDocs, rest) = all.splitAt(80)
    val chunks = rest.sortBy(_.doc_id).grouped(14).map(_.toSeq).toSeq
    val sig = java.nio.file.Files
      .createTempDirectory("graft-ingest-restore").toString + "/sig"
    assert(SigStore.buildIfNeeded(corpusDocs.toDF(), sig, "restoretest",
      "doc_id", "text", "lang"))
    val tdir = java.nio.file.Files
      .createTempDirectory("graft-ingest-ts").toString + "/store"
    val table = TsTable.create(spark, tdir,
      StructType(Seq(StructField("ts", TimestampType),
        StructField("doc_id", LongType))), tsCol = "ts")
    val ms = MemoryStream[Doc]
    val q = DocStream.ingestGateSink(ms.toDF(), sig,
        "doc_id", "text", "lang", tau = 0.8) { adm =>
        table.append(adm.select(col("ts"), col("doc_id")))
      }.start()
    try {
      ms.addData(chunks.head); q.processAllAvailable()
      val good = table.currentVersion.get
      val goodIds = table.toDF.collect().map(_.getLong(1)).toSet
      assert(goodIds.nonEmpty)
      ms.addData(chunks(1)); q.processAllAvailable()
      assert(table.toDF.count() > goodIds.size, "chunk 2 must admit something")
      // operator decision BETWEEN microbatches: chunk 2 was bad — roll the
      // TABLE back to the pin
      table.restore(good)
      assert(table.toDF.collect().map(_.getLong(1)).toSet == goodIds)
      // the gate's memory is NOT rolled back: replaying chunk 2 re-admits
      // nothing (its signatures are already stored), so a replay cannot
      // silently undo the restore — re-admission is an explicit
      // SigStore.delete, by design
      ms.addData(chunks(1)); q.processAllAvailable()
      assert(table.toDF.collect().map(_.getLong(1)).toSet == goodIds)
      // the stream CONTINUES: later chunks keep admitting and landing
      // (the sink re-anchors on the restored max, it does not fail)
      chunks.drop(2).foreach { c => ms.addData(c); q.processAllAvailable() }
      val finalIds = table.toDF.collect().map(_.getLong(1)).toSet
      assert((finalIds -- goodIds).nonEmpty, "post-restore chunks must land")
      assert(finalIds.intersect(chunks(1).map(_.doc_id).toSet).isEmpty,
        "rolled-back rows must not reappear")
      // history is linear and moved FORWARD through the restore
      val hist = table.snapshotVersions
      assert(hist.map(_._1) == (1L to hist.length).toSeq)
      assert(hist.map(_._2).contains("restore"))
    } finally q.stop()
  }

  test("streaming ANN serving: chunked probe stream through the IVF store == " +
      "one batch knnJoin of the same probes") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = Tables.embeddings(spark, sf0001)
    val store = java.nio.file.Files
      .createTempDirectory("graft-ann-serve").toString + "/ivf"
    graft.operators.IvfIndex.build(emb, "vec_id", "embedding", store,
      cells = 10, sampleN = 200)
    val probes = emb.where(col("vec_id") < 12L)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .as[(Long, Seq[Double])].collect().toSeq
    val want = graft.operators.IvfIndex.knnJoin(spark, store,
        probes.toDF("vec_id", "v"), "vec_id", "v", k = 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet

    val got = scala.collection.mutable.Set[(Long, Long, Double)]()
    val ms = MemoryStream[(Long, Seq[Double])]
    val q = DocStream.annServeSink(ms.toDF().toDF("vec_id", "v"), store,
        "vec_id", "v", k = 5, nProbe = 3) { res =>
        got ++= res.collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      }.start()
    try {
      probes.grouped(4).foreach { chunk =>
        ms.addData(chunk); q.processAllAvailable()
      }
      assert(got.toSet == want,
        s"missing=${(want -- got).size} extra=${(got.toSet -- want).size}")
      assert(got.nonEmpty)
    } finally q.stop()
  }
}
