package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector primitives for similarity search.
  *
  * Determinism: float32 embedding components are lifted to exact integer
  * space (round(x * 2^20)); dot products are then sums of exact integers
  * (<= 2^50 for 64-dim unit vectors), which IEEE addition computes exactly in
  * any order — so Spark partial aggregation and the DuckDB oracle land on the
  * same bits. sqrt and a single final division are exact unary IEEE ops.
  * The ~1e-6 quantization is far below any meaningful similarity difference.
  *
  * All of it is transform/zip_with/aggregate — codegen'd, no UDFs, no shuffle
  * until the ranking step.
  */
object EmbeddingFunctions {

  val Scale = 1048576 // 2^20

  /** float vector -> exact integer-valued double vector. The cast matters:
    * without it the products below are computed in float32, whose 24-bit
    * mantissa can't hold 2^44-scale products exactly.
    */
  def scaled(e: Column): Column =
    transform(e, x => round(x.cast("double") * Scale))

  /** Dot product of two pre-scaled vectors (exact integer result). */
  def dotScaled(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** Cosine similarity of two raw float vectors via scaled-int arithmetic.
    * Delegates to the native [[graft.plans.CosineExpr]] (one compiled loop);
    * [[cosineDeclarative]] is the HOF formulation it is bit-identical to
    * (ExprSpec pins the equivalence) — kept because zip_with/aggregate are
    * CodegenFallback and pay ~3*dim interpreted closure calls per row.
    */
  def cosine(a: Column, b: Column): Column =
    graft.plans.CosineExpr.cosine(a, b)

  /** The declarative twin of [[cosine]] (reference semantics). */
  def cosineDeclarative(a: Column, b: Column): Column = {
    val sa = scaled(a); val sb = scaled(b)
    dotScaled(sa, sb) / (sqrt(dotScaled(sa, sa)) * sqrt(dotScaled(sb, sb)))
  }

  /** DuckDB equivalents (a, b are list expressions). The CAST AS DOUBLE
    * mirrors the Spark-side cast: DuckDB would otherwise multiply float32s
    * and round the 2^44-scale products.
    */
  def scaledElemSql(a: String, i: String): String =
    s"round(CAST(($a)[$i] AS DOUBLE) * $Scale)"

  def dotScaledSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> ${scaledElemSql(a, "i")} * ${scaledElemSql(b, "i")}))"

  def cosineSql(a: String, b: String): String =
    s"(${dotScaledSql(a, b)} / (sqrt(${dotScaledSql(a, a)}) * sqrt(${dotScaledSql(b, b)})))"
}
