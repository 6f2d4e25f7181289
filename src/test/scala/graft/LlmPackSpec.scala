package graft

import graft.operators.{LlmPack, NearDedup}
import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** B9 LLM-pipeline operators: dedup recall, fingerprint properties.
  * Oracle hash-parity is covered by the driver (check_oracle.py locally);
  * these tests cover what the oracle can't — recall vs brute force and
  * hash-function properties. */
class LlmPackSpec extends SparkSpec {

  test("exact dedup: fixture docs are unique, one representative each") {
    val out = LlmPack.dedupExact(spark, sf0001).collect()
    assert(out.length == 500)
    assert(out.forall(_.getLong(1) == 1L)) // n_copies
  }

  test("near-dup: prefix filter and minhash-LSH find the same pairs as brute force") {
    val docs = Tables.documents(spark, sf0001)
    // Brute-force ground truth: all within-lang pairs, exact 3-gram Jaccard.
    // Fine at n=500 in a test; NEVER in the operators themselves.
    val sets = docs.select(col("doc_id").as("id"), col("lang"),
      TextFns.shingles3(col("text")).as("sh")).where(size(col("sh")) > 0)
    val a = sets.select(col("id").as("a_id"), col("lang"), col("sh").as("a_sh"))
    val b = sets.select(col("id").as("b_id"), col("lang").as("b_lang"), col("sh").as("b_sh"))
    val truth = a.join(b, col("lang") === col("b_lang") && col("a_id") < col("b_id"))
      .withColumn("j", TextFns.jaccard(col("a_sh"), col("b_sh")))
      .where(col("j") >= 0.8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty) // fixture plants near-dup pairs

    val viaPrefix = LlmPack.dedupNear(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaMinhash = LlmPack.dedupMinhash(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaPrefix == truth) // 100% recall by construction
    assert(viaMinhash == truth) // p(miss) ~ 5e-8 at tau, ~1e-23 for planted pairs
  }

  test("simhash: deterministic; near-duplicates closer in Hamming space than unrelated docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (3L, "completely different subject matter about spark catalyst optimizer internals")
    ).toDF("id", "text")
    def sigs = docs.select(col("id"), NearDedup.simhash64(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s1 = sigs
    assert(s1 == sigs) // two plans, same fingerprints
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(s1(1L), s1(2L)) < ham(s1(1L), s1(3L)))
    assert(ham(s1(1L), s1(2L)) <= 8) // one-token edit => few bit flips
  }

  test("token top-k and text stats agree with direct recomputation") {
    val stats = LlmPack.textStats(spark, sf0001).collect()
    assert(stats.length == 5) // 5 langs
    val totalDocs = stats.map(_.getLong(1)).sum
    assert(totalDocs == 500)
    val topk = LlmPack.tokenTopk(spark, sf0001).collect()
    assert(topk.length == 20)
    // descending counts, ties broken by token
    val ns = topk.map(_.getLong(1)).toSeq
    assert(ns == ns.sorted.reverse)
  }
}
