package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact, order-independent numeric kernels.
  *
  * Why this exists: distributed sums over `double` are non-associative — the
  * per-partition partial order changes the low bits run to run, which (a)
  * breaks byte-exact comparison against any oracle and (b) makes results
  * cluster-layout-dependent at 100 TB. Two fixes used throughout the engine:
  *
  *   1. Money/measure columns are cast to exact `DecimalType` BEFORE any
  *      aggregation. Decimal addition is associative, so partial aggregation
  *      (map-side combine) stays enabled and the result is identical for any
  *      partitioning — 4 partitions or 4000.
  *
  *   2. Float vectors are quantized to integer micro-units (`x * 1e6`
  *      rounded) per element — a purely local, deterministic op — and all
  *      cross-element arithmetic (dot products, norms, centroids) happens in
  *      exact Long/Decimal space. One final IEEE op (sqrt/divide) on exact
  *      inputs is itself deterministic.
  *
  * The same construction is expressed in each query's DuckDB oracle SQL, so
  * both engines compute bit-identical values.
  */
object Exact {

  /** Cast a double measure to exact decimal: default fits TPC-H money.
    * Library-internal only — final query schemas must NOT emit decimals
    * (the driver's hash is decimal-representation-sensitive); use [[cents]].
    */
  def dec(c: Column, precision: Int = 18, scale: Int = 2): Column =
    c.cast(DecimalType(precision, scale))

  /** Quantize a money/measure double to exact integer cents (1e-2 units).
    * round() is HALF_UP (away from zero) in both Spark and DuckDB, and the
    * rounded double is integral, so the long cast is exact in both engines.
    * All sums over cents are exact, associative longs — partial aggregation
    * stays enabled and results are identical at any parallelism. SQL mirror:
    * `CAST(round(x * 100) AS BIGINT)`.
    */
  def cents(c: Column): Column =
    round(c.cast("double") * lit(100)).cast("long")

  /** Quantize a float/double to integer micro-units (1e-6 resolution).
    * round() is HALF_UP (away from zero) in both Spark and DuckDB, so the
    * quantization — and everything built on it — is cross-engine exact.
    */
  def micro(c: Column): Column =
    round(c.cast("double") * lit(1000000.0)).cast("long")

  /** Exact integer dot product of two float vectors (micro-quantized).
    * zip_with + aggregate stay inside codegen; sums of longs are exact and
    * associative so the plan is free to reorder/combine partials.
    */
  def dotMicro(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => micro(x) * micro(y)),
      lit(0L),
      (acc, v) => acc + v)

  /** Exact integer squared L2 norm of a micro-quantized float vector. */
  def normSqMicro(a: Column): Column =
    aggregate(transform(a, x => { val m = micro(x); m * m }), lit(0L),
      (acc, v) => acc + v)

  /** Cosine similarity from exact integer dot/norms: a single IEEE divide +
    * sqrt over exact integers — bit-identical in any engine, any row order.
    */
  def cosineMicro(dot: Column, normSqA: Column, normSqB: Column): Column =
    dot.cast("double") /
      sqrt(normSqA.cast("double") * normSqB.cast("double"))
}
