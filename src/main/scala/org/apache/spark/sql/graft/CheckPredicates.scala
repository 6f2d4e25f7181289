package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.QueryPlanningTracker
import org.apache.spark.sql.catalyst.expressions.{BindReferences, Coalesce, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.types.StructType

/** Compile a CHECK-constraint SQL predicate into an executor-evaluable
  * bound expression — the piece that lets the V2 connector's streaming
  * per-row writer enforce table constraints without a second batch pass.
  *
  * The returned expression is `coalesce(<predicate>, true)` bound to the
  * schema's ordinals: SQL CHECK semantics fold in at compile time (NULL =
  * unknown = pass; only FALSE violates), so the caller just evaluates to
  * a primitive boolean per row. Resolution runs through the session's own
  * parser + analyzer against a LocalRelation of the table schema —
  * unknown columns, type errors, or non-boolean predicates fail HERE, on
  * the driver, never as a per-row surprise on an executor. */
object CheckPredicates {

  def bind(spark: SparkSession, schema: StructType, sql: String): Expression = {
    val session = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val attrs = DataTypeUtils.toAttributes(schema)
    val parsed = session.sessionState.sqlParser.parseExpression(sql)
    val analyzed = session.sessionState.analyzer.executeAndCheck(
      Filter(parsed, LocalRelation(attrs)), new QueryPlanningTracker)
    val cond = analyzed.collectFirst { case f: Filter => f.condition }
      .getOrElse(throw new IllegalArgumentException(
        s"CHECK predicate '$sql' did not analyze to a filter condition"))
    BindReferences.bindReference(
      Coalesce(Seq(cond, Literal.TrueLiteral)), attrs)
  }
}
