package graft.functions

import graft.vpts.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** File-name parsing cases from the reference's parametrized tables
  * (tests/test_s3.py:19-111) + source_file regex cases
  * (tests/test_vpts_csv.py:93-113).
  */
class OdimPathsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private def parse(name: String): (String, String, String, String, String, String, String) = {
    import spark.implicits._
    val df = Seq(name).toDF("f")
    val row = df.select(
      OdimPaths.radarCode(col("f")), OdimPaths.dataType(col("f")),
      OdimPaths.year(col("f")), OdimPaths.month(col("f")), OdimPaths.day(col("f")),
      OdimPaths.hour(col("f")), OdimPaths.minute(col("f"))).head()
    (row.getString(0), row.getString(1), row.getString(2), row.getString(3),
      row.getString(4), row.getString(5), row.getString(6))
  }

  test("reference file-name parse cases") {
    assert(parse("fivan_vp_20161025T2100Z_0x7_147742969449.h5") ==
      (("fivan", "vp", "2016", "10", "25", "21", "00")))
    assert(parse("fiuta_vp_20211114T214500Z_0xb.h5") ==
      (("fiuta", "vp", "2021", "11", "14", "21", "45")))
    assert(parse("seang_vp_20170120T2115Z_0xf3fc7b_148494821853.h5") ==
      (("seang", "vp", "2017", "01", "20", "21", "15")))
    // no 'T', uppercase radar -> lowercased
    assert(parse("NLDBL_vp_20080215T0000_NL50_v0-3-20.h5") ==
      (("nldbl", "vp", "2008", "02", "15", "00", "00")))
    // invalid name -> empty extracts
    assert(parse("not a valid file name")._1 == "")
    // full path and plpoz no-T form
    assert(parse("baltrad/hdf5/plpoz/2016/09/23/plpoz_vp_2016092317435500.h5") ==
      (("plpoz", "vp", "2016", "09", "23", "17", "43")))
  }

  test("derived keys match the reference path algebra") {
    import spark.implicits._
    val df = Seq(("baltrad", "bejab_vp_20221111T233000Z_0x9.h5")).toDF("source", "f")
    val row = df.select(
      OdimPaths.dailyVptsKey(col("source"), col("f")),
      OdimPaths.monthlyVptsKey(col("source"), col("f")),
      OdimPaths.h5DayPrefix(col("source"), col("f")),
      OdimPaths.country(col("f"))).head()
    assert(row.getString(0) == "baltrad/daily/bejab/2022/bejab_vpts_20221111.csv")
    assert(row.getString(1) == "baltrad/monthly/bejab/2022/bejab_vpts_202211.csv.gz")
    assert(row.getString(2) == "baltrad/hdf5/bejab/2022/11/11")
    assert(row.getString(3) == "be")
  }

  test("source_file guard accepts/rejects the reference cases") {
    import graft.vpts.VptsCsvV1.checkSourceFile
    assert(checkSourceFile("s3://aloftdata/baltrad/x.h5") == "s3://aloftdata/baltrad/x.h5")
    assert(checkSourceFile("bejab_vp_20221111T233000Z_0x9.h5").nonEmpty)
    assert(checkSourceFile("C://x.h5").nonEmpty)
    assertThrows[IllegalArgumentException](checkSourceFile("/abs/path.h5"))
    assertThrows[IllegalArgumentException](checkSourceFile("./rel.h5"))
    assertThrows[IllegalArgumentException](checkSourceFile("../rel.h5"))
    assertThrows[IllegalArgumentException](checkSourceFile("a/../b.h5"))
  }
}
