package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<double>` columns via higher-order
  * functions (SURVEY.md §2 B8/B9). `zip_with` + `aggregate` compile to
  * builtin Catalyst expressions, so cosine ranking runs inside codegen with
  * zero UDFs, and the sequential left-fold accumulation matches DuckDB's
  * sequential list_dot_product loop bit-for-bit (same IEEE ops, same
  * order) — which is what lets q_sim_topk carry a hash-compared oracle.
  */
object VectorFns {

  /** Dot product of two equal-length array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; callers round before emitting in oracle-compared
    * output. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))
}
