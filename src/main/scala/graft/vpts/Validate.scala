package graft.vpts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema-as-oracle validation op — the Spark equivalent of `validate_vpts`
  * (`vpts.py:297-317`), which round-trips the frame through the frictionless
  * table-schema validator. Here each VPTS-CSV v1 field constraint becomes a
  * when-counted rule column; one pass, one aggregate, no shuffle beyond the
  * final global count — at 100 TB this is a scan-speed integrity audit.
  */
object Validate {

  final case class Report(errors: Long, byRule: Map[String, Long])

  private val FloatRe =
    "^-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?$|^NaN$|^-?inf$|^nan$|^$"
  private val IntRe = "^-?\\d+$|^$"
  private val IsoRe = "^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}Z$"

  private def ruleViolation(name: String, bad: Column): (String, Column) =
    name -> sum(when(bad, 1L).otherwise(0L)).as(name)

  /** Per-rule violation counts over a VPTS v1 string DataFrame. */
  def validateVpts(df: DataFrame): Report = {
    val floatCols = Seq("u", "v", "w", "ff", "dd", "sd_vvp", "eta", "dens",
      "dbz", "dbz_all", "rcs", "sd_vvp_threshold",
      "radar_latitude", "radar_longitude", "radar_wavelength")
    val intCols = Seq("height", "n", "n_dbz", "n_all", "n_dbz_all", "vcp",
      "radar_height")
    val rules: Seq[(String, Column)] =
      Seq(
        ruleViolation("radar_empty", col("radar").isNull || col("radar") === ""),
        ruleViolation("datetime_format", !col("datetime").rlike(IsoRe)),
        ruleViolation("gap_enum", !col("gap").isin("TRUE", "FALSE", "NaN", "")),
        ruleViolation("source_file_path",
          !col("source_file").rlike("^[^/.~]") && col("source_file") =!= "")) ++
        floatCols.map(c => ruleViolation(s"${c}_float", !col(c).rlike(FloatRe))) ++
        intCols.map(c => ruleViolation(s"${c}_int", !col(c).rlike(IntRe)))
    val row = df.agg(rules.head._2, rules.tail.map(_._2): _*).head()
    val byRule = rules.map(_._1).zipWithIndex.map { case (n, i) => n -> row.getLong(i) }.toMap
    Report(byRule.values.sum, byRule)
  }
}
