package graft.vpts

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VptsReadbackSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  test("string-preserving read-back of the golden daily CSV") {
    val df = Vpts.readVptsCsv(spark,
      "/root/reference/tests/data/inventory/nosta_vpts_20230311.csv")
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Vpts.schemaV1.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(df.count() == 125)
    // sentinels survive: nodata "" and undetect "NaN" as literal strings
    val first = df.orderBy(col("datetime"), col("height").cast("int")).head()
    assert(first.getAs[String]("u") == "")
    assert(first.getAs[String]("gap") == "TRUE")
    assert(df.filter(col("u").isNull).count() == 0)
    // round-trip: writing it back reproduces the golden bytes
    val tmp = java.nio.file.Files.createTempDirectory("rt").resolve("rt.csv")
    Vpts.vptsToCsv(Vpts.sortCanonical(df), tmp.toString)
    val got = new String(java.nio.file.Files.readAllBytes(tmp), "UTF-8")
    val want = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/data/inventory/nosta_vpts_20230311.csv")), "UTF-8")
    assert(got == want)
  }

  test("per-(radar,datetime) height sets are identical (A6 invariant)") {
    val df = Vpts.vpts(spark, Seq("/root/reference/tests/data/vp"))
    val sets = df.groupBy(col("radar"), col("datetime"))
      .agg(sort_array(collect_set(col("height").cast("int"))).as("hs"))
      .select(col("hs").cast("string")).distinct().count()
    assert(sets == 1)
  }

  test("GraftExtensions builders apply cleanly") {
    // smoke: injection list built without error (full wiring needs a fresh
    // session via --conf spark.sql.extensions=graft.GraftExtensions)
    val ext = new graft.GraftExtensions()
    ext.apply(new org.apache.spark.sql.SparkSessionExtensions())
  }
}
