package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, kept declarative
  * (higher-order functions stay inside Catalyst/codegen — no UDF, no
  * serialization of the row).
  *
  * Precision contract: elements are cast to double BEFORE multiply and
  * accumulated left-to-right (`aggregate` is a sequential fold), so the
  * result is bit-reproducible across engines that do the same — which
  * is exactly how the DuckDB oracles are written.
  */
object vec {
  def toDoubleArr(a: Column): Column = transform(a, _.cast("double"))

  /** Sequential-fold dot product in double precision — the native
    * codegen'd [[graft.plans.DotProduct]], resolved through the
    * function registry (requires [[graft.plans.GraftExtensions]] on
    * the session; same numeric contract as [[dotDeclarative]]). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Pure-builtin formulation (higher-order functions; no extension
    * required). Numerically identical to [[dot]] — the spec asserts
    * it — but interpreted, so keep it off 100 TB hot paths. */
  def dotDeclarative(a: Column, b: Column): Column =
    aggregate(zip_with(toDoubleArr(a), toDoubleArr(b), (x, y) => x * y),
              lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via precomputed norms (avoid recomputing ||v|| per pair —
    * at 100 TB the norm is computed once per vector, not once per
    * candidate pair). */
  def cosineWithNorms(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)
}
