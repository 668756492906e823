package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded operator query: a Spark implementation plus (when SQL-expressible)
  * an equivalent DuckDB oracle over the same parquet tables.
  *
  * Determinism contract (so the driver's value-hash compare is stable across
  * engines): every query ends in an explicit ORDER BY; float aggregates are
  * computed in exact-integer double space (scale-by-100, single final
  * division); arrays are rendered as joined strings; timestamps are rendered
  * as formatted strings.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

/** All registered queries, collected from the operator modules. */
object Registry {
  lazy val all: Seq[QueryDef] =
    operators.Relational.entries ++
      operators.Analytics.entries ++
      operators.Dedup.entries ++
      operators.Similarity.entries ++
      operators.TextOps.entries ++
      operators.Multimodal.entries ++
      operators.PipelineOps.entries ++
      operators.Bpe.entries ++
      operators.VptsOps.entries

  lazy val byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
