package graft

import graft.operators.NearDedup
import org.apache.spark.sql.functions._

/** Corpus-scale tripwire for the near-dup candidate generators (r8 verdict
  * #6): a ~30k-doc deliberately SKEWED corpus (every doc opens with the
  * same hot phrase, Zipfian vocabulary) with planted near-dup pairs, built
  * in-test so the 10× scale step has a regression guard the driver never
  * has to discover at bench time. Asserts recall of the planted pairs, a
  * no-false-positives floor (exact verify), and a wall-time ceiling with
  * generous CI headroom — a quadratic or skew-stalled regression blows the
  * ceiling by orders of magnitude, while honest variance does not. */
class NearDedupStressSpec extends SparkSpec {

  private val NDocs = 30000
  private val PlantEvery = 500 // doc i -> near-dup copy at i+1

  /** Deterministic skewed corpus: 18 uniform-vocab tokens per doc behind a
    * corpus-wide hot prefix ("the of and" sits in EVERY doc — df = NDocs,
    * the stalled-reducer shape the rankedByDf split exists for; the body
    * tokens stay near-uniform so unrelated docs share few shingles and the
    * true pair set is dominated by the plants). Every PlantEvery-th doc is
    * followed by a copy with one token changed (J well above tau). */
  private def corpus() = {
    import spark.implicits._
    val docs = (0 until NDocs).map { i =>
      if (i % PlantEvery == 1) {
        val prev = tokensOf(i - 1)
        (i.toLong, ("the of and" +: prev.init :+ "mutated").mkString(" "))
      } else (i.toLong, ("the of and" +: tokensOf(i)).mkString(" "))
    }
    docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
  }

  private def tokensOf(i: Int): Seq[String] = {
    val rnd = new scala.util.Random(i * 2654435761L)
    Seq.fill(18)(s"w${rnd.nextInt(2000)}")
  }

  /** Planted pairs that TRULY land at J >= tau: a copy-with-one-token-edit
    * usually sits near J ≈ 0.85, but repeated tokens can shrink a doc's
    * distinct-shingle set enough to push an individual pair under the
    * threshold — so the recall contract ("every pair at-or-above tau is
    * found") is asserted against the exactly-computed truth of the planted
    * candidates, not the plant list itself. */
  private def plantedAtTau(docs: org.apache.spark.sql.DataFrame,
                           tau: Double): Set[(Long, Long)] = {
    import graft.functions.TextFns
    val ids = (0 until NDocs).collect {
      case i if i % PlantEvery == 1 => Seq((i - 1).toLong, i.toLong)
    }.flatten
    val sets = docs.where(col("doc_id").isin(ids: _*))
      .select(col("doc_id"), TextFns.shingles3(col("text")).as("sh"))
    val a = sets.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = sets.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
    a.join(b, col("b_id") === col("a_id") + 1)
      .where(TextFns.jaccard(col("a_sh"), col("b_sh")) >= tau)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  test("prefixFilter at 30k skewed docs: planted pairs found, bounded wall time") {
    val docs = corpus()
    val want = plantedAtTau(docs, 0.8)
    assert(want.size >= 50, s"degenerate fixture: only ${want.size} true pairs")
    val (pairs, secs) = timed {
      NearDedup.prefixFilter(docs, "doc_id", "text", "lang", tau = 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // pigeonhole recall is 100% BY CONSTRUCTION: every true pair must surface
    assert(want.subsetOf(pairs), s"missed true pairs: ${(want -- pairs).take(5)}")
    // exact verify ⇒ no sub-threshold pair can leak; random 18-token docs
    // almost never hit J >= 0.8, so the output stays near the planted set
    assert(pairs.size < want.size * 3, s"${pairs.size} pairs vs ${want.size} planted")
    assert(secs < 60, s"prefixFilter took $secs s at $NDocs docs — scale regression")
  }

  test("materialized path at 30k docs: identical pairs, sets computed once, " +
      "nothing left pinned in the cache manager") {
    val docs = corpus()
    val lazyPairs = NearDedup.prefixFilter(docs, "doc_id", "text", "lang", tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (matPairs, secs) = timed {
      NearDedup.prefixFilter(docs, "doc_id", "text", "lang", tau = 0.8,
          materialize = Some(true))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // the materialized plan is the same algorithm, single-evaluated
    assert(matPairs == lazyPairs,
      s"materialized path diverged: ${(matPairs diff lazyPairs).take(3)} / ${(lazyPairs diff matPairs).take(3)}")
    assert(secs < 60, s"materialized prefixFilter took $secs s — scale regression")
    // the sets persist must be freed before return: the only surviving new
    // persistent RDD is the bounded pair-list checkpoint itself
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
    assert(leaked.size <= 1, s"persist leak: ${leaked.size} new pinned RDDs")
    // same for minhash (the clusterPairs feeder)
    val mh = NearDedup.minhashLsh(docs, "doc_id", "text", "lang", tau = 0.8,
        materialize = Some(true))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mhLazy = NearDedup.minhashLsh(docs, "doc_id", "text", "lang", tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh == mhLazy)
  }

  test("minhashLsh at 30k skewed docs: planted pairs found, bounded wall time") {
    val docs = corpus()
    val want = plantedAtTau(docs, 0.8)
    val (pairs, secs) = timed {
      NearDedup.minhashLsh(docs, "doc_id", "text", "lang", tau = 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // true pairs sit at J >= 0.8: per-pair LSH miss p <= 5e-8, so across
    // ~60 pairs the all-found probability is still > 1 - 1e-5
    assert(want.subsetOf(pairs), s"missed true pairs: ${(want -- pairs).take(5)}")
    assert(pairs.size < want.size * 3, s"${pairs.size} pairs vs ${want.size} planted")
    assert(secs < 60, s"minhashLsh took $secs s at $NDocs docs — scale regression")
  }
}
