package graft

import graft.operators.RelationalPack
import org.apache.spark.sql.functions._

/** q_fuzzy_join: edit-distance candidate pairs with last-token blocking.
  * The oracle pins cross-engine value parity; here we pin the SEMANTICS
  * (distance really is Levenshtein, pairs are canonical and block-local)
  * and the SCALE claim (the plan contains no cartesian product — the
  * blocking key is a real equi-join key).
  */
class FuzzyJoinSpec extends SparkSpec {

  /** Reference Wagner–Fischer, the definition both engines implement. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("fuzzy pairs: canonical order, block-local, true Levenshtein <= 3") {
    val rows = RelationalPack.fuzzyJoin(spark, sf0001).collect()
    assert(rows.nonEmpty, "fixture part names contain near-duplicates")
    rows.foreach { r =>
      val (na, nb) = (r.getString(0), r.getString(1))
      assert(r.getLong(3) < r.getLong(4), "pk_a < pk_b canonicalization")
      assert(na.split(" ").last == nb.split(" ").last,
        "pairs only within the last-token block")
      assert(r.getLong(2) == lev(na, nb).toLong,
        s"engine distance must be Wagner-Fischer for ($na, $nb)")
      assert(r.getLong(2) <= 3)
    }
  }

  test("fuzzy join recall within block: no qualifying in-block pair is dropped") {
    val names = Tables.part(spark, sf0001)
      .groupBy(col("p_name")).agg(min(col("p_partkey")).as("pk"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = (for {
      (na, pa) <- names; (nb, pb) <- names
      if pa < pb && na.split(" ").last == nb.split(" ").last &&
        lev(na, nb) <= 3
    } yield (pa, pb)).toSet
    val got = RelationalPack.fuzzyJoin(spark, sf0001)
      .collect().map(r => (r.getLong(3), r.getLong(4))).toSet
    assert(got == expected)
  }

  test("plan: blocking is an equi-join, not a cartesian product") {
    val plan = RelationalPack.fuzzyJoin(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "blocking key must plan as a hash/merge equi-join")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "blocking key must not degrade to a nested-loop join")
  }
}
