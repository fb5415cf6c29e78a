package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over ArrayType(FloatType) columns (SURVEY.md §2.11).
  * Higher-order built-ins only (zip_with/aggregate/transform) — codegen'd,
  * distributed, no UDF serialization. Everything computes in DOUBLE with a
  * sequential left-fold so the DuckDB oracle (same casts, list_transform +
  * list_sum) reproduces results to full precision; DuckDB's native
  * list_cosine_similarity accumulates in float32 and is deliberately NOT the
  * oracle formulation.
  */
object VectorFns {
  import org.apache.spark.sql.graftshim.GraftColumn
  import graft.functions.expr.DotProductF32

  /** Dot product in double precision — the codegen'd [[DotProductF32]]
    * expression (hot-path form; same fold order as [[dotHof]]).
    */
  def dot(a: Column, b: Column): Column =
    GraftColumn.lift2(DotProductF32.apply)(a, b)

  /** Higher-order-function dot — the portable reference formulation the
    * DuckDB oracle mirrors; property-tested equal to [[dot]].
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Fused squared-L2 distance (|a|²+|b|²-2a·b in ONE array pass) — see
    * [[graft.functions.expr.SqL2DistF32]]; bit-equal to [[sqL2Composed]],
    * property-tested. The PQ distance kernel.
    */
  def sqL2(a: Column, b: Column): Column =
    GraftColumn.lift2(graft.functions.expr.SqL2DistF32.apply)(a, b)

  /** Composed three-dot form — the property-test reference for [[sqL2]]. */
  def sqL2Composed(a: Column, b: Column): Column =
    dot(a, a) + dot(b, b) - lit(2.0) * dot(a, b)

  /** Fused single-expression cosine (see [[graft.functions.expr.CosineSimF32]]);
    * bit-equal to [[cosineComposed]], property-tested.
    */
  def cosine(a: Column, b: Column): Column =
    GraftColumn.lift2(graft.functions.expr.CosineSimF32.apply)(a, b)

  /** Composed form (three expression evaluations) — reference for the test. */
  def cosineComposed(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Axis-aligned sign-bit LSH bucket over the first `bits` dimensions: bit j
    * set iff v[j+1] > 0. Deterministic (no RNG to ship to the oracle) and the
    * scale path for ANN: candidates are confined to the probe's bucket, so a
    * 100 TB corpus prunes to ~n/2^bits before any distance math.
    */
  def signBucket(v: Column, bits: Int): Column =
    aggregate(
      transform(
        sequence(lit(0), lit(bits - 1)),
        j => when(get(v, j) > 0, pow(lit(2.0), j).cast("int")).otherwise(lit(0))),
      lit(0),
      (acc, x) => acc + x)

  /** Sign-bit bucket over dims [offset, offset+bits): the band-`b` variant of
    * [[signBucket]] (offset = b*bits). Multi-band LSH unions candidates from
    * several disjoint dim groups, trading one more linear pass per band for
    * recall — the standard banding construction (one band missing a pair is
    * recovered by any other band agreeing).
    */
  def signBucketAt(v: Column, offset: Int, bits: Int): Column =
    aggregate(
      transform(
        sequence(lit(0), lit(bits - 1)),
        j => when(get(v, j + offset) > 0, pow(lit(2.0), j).cast("int")).otherwise(lit(0))),
      lit(0),
      (acc, x) => acc + x)
}
