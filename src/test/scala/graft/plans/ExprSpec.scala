package graft.plans

import graft.vpts.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ExprSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("minhash_sig8 registered as a SQL function matches the Column API") {
    import org.apache.spark.sql.functions._
    MinhashSigExpr.register(spark)
    graft.Tables.documents(spark, sfDir).createOrReplaceTempView("docs_t")
    val viaSql = spark.sql(
      "SELECT doc_id, concat_ws('|', minhash_sig8(text)) AS sig FROM docs_t ORDER BY doc_id")
      .collect().map(_.getString(1))
    val viaCol = graft.Tables.documents(spark, sfDir).orderBy("doc_id")
      .select(concat_ws("|", MinhashSigExpr.minhashSig8Native(col("text"))))
      .collect().map(_.getString(0))
    assert(viaSql.sameElements(viaCol))
    assert(viaSql.head.split("\\|").length == 8)
  }

  test("native expressions match the declarative formulations") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val d = graft.Tables.documents(spark, sfDir).limit(50)
    val native = d.select(col("doc_id"),
      concat_ws("|", MinhashSigExpr.minhashSig8Native(col("text"))).as("sig"))
      .orderBy("doc_id").collect().map(_.getString(1))
    val declarative = d.select(col("doc_id"),
      concat_ws("|", minhashSig8(shingles(words(col("text")), 3))).as("sig"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(native.sameElements(declarative))
  }

  test("resource descriptor matches the reference layout") {
    val dir = java.nio.file.Files.createTempDirectory("desc")
    graft.vpts.Vpts.writeResourceDescriptor(dir.resolve("vpts.csv").toString)
    val json = java.nio.file.Files.readString(dir.resolve("vpts.resource.json"))
    assert(json.contains("\"name\": \"vpts\""))
    assert(json.contains("\"path\": \"vpts.csv\""))
    assert(json.contains("vpts-csv/v1.0/vpts-csv-table-schema.json"))
  }
}
