package graft

import graft.operators.SimilaritySearch
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKAggExprs

/** TopKByScore (bounded-heap per-group top-k) and the batch kNN join built
  * on it. */
class TopKSpec extends SparkSpec {

  test("agg matches the window row_number formulation, ties included") {
    val ev = Tables.events(spark, sf001)
      .select(col("event_type"), col("value"), col("event_id"))
    val viaAgg = ev.groupBy(col("event_type"))
      .agg(TopKAggExprs.topKByScore(col("value"), col("event_id"), 5).as("top"))
      .select(col("event_type"), posexplode(col("top")))
      .select(col("event_type"), (col("pos") + 1).as("rn"),
        col("col.vec_id").as("event_id"), col("col.sim").as("value"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    val viaWindow = ev
      .select(col("event_type"), row_number().over(w).as("rn"),
        col("event_id"), col("value"))
      .where(col("rn") <= 5)
    assert(viaAgg.orderBy("event_type", "rn").collect().toSeq ==
      viaWindow.orderBy("event_type", "rn").collect().toSeq)
  }

  test("equal scores break toward the smaller id deterministically") {
    import spark.implicits._
    // 4 rows tied at 1.0 plus a better and a worse one; k=3
    val df = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0), (4L, 1.0), (5L, 2.0), (6L, 0.5))
      .toDF("id", "s")
    val top = df.groupBy(lit(1))
      .agg(TopKAggExprs.topKByScore(col("s"), col("id"), 3).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.sim"), col("e.vec_id")).collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(top == Seq((2.0, 5L), (1.0, 1L), (1.0, 2L)))
  }

  test("k larger than the group returns the whole group, best-first") {
    import spark.implicits._
    val df = Seq((1L, 0.1), (2L, 0.7)).toDF("id", "s")
    val top = df.groupBy(lit(1))
      .agg(TopKAggExprs.topKByScore(col("s"), col("id"), 10).as("top"))
      .select(size(col("top")).as("n"), col("top")(0)("vec_id").as("best"))
      .head()
    assert(top.getInt(0) == 2 && top.getLong(1) == 2L)
  }

  test("plan reduces map-side: partial graft_topk before the shuffle") {
    val ev = Tables.events(spark, sf001)
    val plan = ev.groupBy(col("event_type"))
      .agg(TopKAggExprs.topKByScore(col("value"), col("event_id"), 3).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_topk"),
      s"expected a partial aggregation stage, got:\n$plan")
  }

  test("knnJoin: every probe gets k rows matching per-probe bruteForceTopK") {
    val emb = Tables.embeddings(spark, sf001)
    val out = SimilaritySearch.knnJoin(emb, emb.where(col("vec_id") < 4),
      idCol = "vec_id", vecCol = "embedding", k = 3).collect()
    assert(out.length == 4 * 3)
    for (pid <- 0L until 4L) {
      val mine = out.filter(_.getLong(0) == pid)
        .sortBy(_.getLong(1)).map(r => (r.getLong(2), r.getDouble(3))).toSeq
      val ref = SimilaritySearch.bruteForceTopK(emb, "vec_id", "embedding", pid, 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(mine == ref, s"probe $pid: $mine vs $ref")
    }
  }
}
