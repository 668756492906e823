package graft.lake

import graft.vpts.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.zip.GZIPInputStream

/** Golden parity for the lake pipeline against the reference fixtures
  * (tests/test_s3.py:408-568, tests/test_vph5_to_vpts.py:20-68).
  */
class LakeSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  val invDir = "/root/reference/tests/data/inventory"

  def gunzip(path: java.nio.file.Path): String = {
    val in = new GZIPInputStream(Files.newInputStream(path))
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  test("manifest scan yields the inventory chunk keys (S5)") {
    val keys = Inventory.manifestKeys(spark, s"$invDir/dummy_manifest.json")
    assert(keys == Seq(
      "dummy-aloftdata/dummy-aloftdata-hdf5-files-inventory/data/dummy_inventory.csv.gz"))
    // manifest-driven read resolves chunks and produces the same coverage
    val inv = Inventory.readFromManifest(spark, s"$invDir/dummy_manifest.json")
    assert(Inventory.coverage(inv).count() == 5)
  }

  test("coverage CSV matches the reference golden") {
    val inv = Inventory.read(spark, s"$invDir/dummy_inventory.csv.gz")
    val out = Files.createTempDirectory("cov").resolve("coverage.csv")
    CsvSink.writeSingleCsv(Inventory.coverage(inv), out.toString)
    val got = new String(Files.readAllBytes(out), "UTF-8")
    val want = new String(Files.readAllBytes(Paths.get(s"$invDir/coverage.csv")), "UTF-8")
    assert(got == want)
  }

  test("modified-window day selection matches reference expectations") {
    // windows relative to the fixture's max modified (2023-01-31): 60 days
    // selects all 5 radar-days, 5 days selects the 2023-01-28+ subset, 1 day
    // selects only the 2023-01-31 rows (cf. test_s3.py:414-425).
    val inv = Inventory.read(spark, s"$invDir/dummy_inventory.csv.gz")
    val now = java.time.Instant.parse("2023-01-31T12:00:00Z")
    def days(win: Int) = LakeController.dayKeys(Inventory.daysToRebuild(inv, win, now))
    assert(days(60).size == 5)
    assert(days(5).map(d => (d.radar, d.dd)).toSet ==
      Set(("fiuta", "24"), ("nosta", "11"), ("plpoz", "23")))
    assert(days(1).map(_.radar).toSet == Set("nosta"))
    // 0 expands to the full bucket age (vph5_to_vpts.py:132-138): every
    // radar-day present in the inventory is rebuilt, regardless of `now`
    assert(days(0).size == 5)
    assert(LakeController.dayKeys(Inventory.daysToRebuild(inv, 0,
      java.time.Instant.parse("2030-01-01T00:00:00Z"))).size == 5)
  }

  test("end-to-end incremental rebuild: daily + monthly byte-match goldens") {
    // Stage a local "bucket" with the 5 nosta h5 files laid out like the
    // reference's moto bucket, plus an inventory pointing at them.
    val bucket = Files.createTempDirectory("lake").toString
    val h5Dir = Paths.get(s"$bucket/baltrad/hdf5/nosta/2023/03/11")
    Files.createDirectories(h5Dir)
    Files.list(Paths.get(s"$invDir/vp")).forEach { f =>
      Files.copy(f, h5Dir.resolve(f.getFileName), StandardCopyOption.REPLACE_EXISTING)
    }
    val invLines = Files.list(h5Dir).sorted.toArray.map { f =>
      s"""dummy,baltrad/hdf5/nosta/2023/03/11/${f.asInstanceOf[java.nio.file.Path].getFileName},123,2023-03-12T00:00:00.000Z"""
    }
    val invPath = Paths.get(s"$bucket/inventory.csv")
    Files.write(invPath, invLines.mkString("\n").getBytes("UTF-8"))

    val (okDays, okMonths) = LakeController.run(
      spark, bucket, invPath.toString, modifiedDaysAgo = 2,
      now = java.time.Instant.parse("2023-03-12T12:00:00Z"),
      coverageOut = Some(s"$bucket/coverage.csv"))
    assert(okDays == 1 && okMonths == 1)

    val daily = new String(Files.readAllBytes(
      Paths.get(s"$bucket/baltrad/daily/nosta/2023/nosta_vpts_20230311.csv")), "UTF-8")
    val wantDaily = new String(Files.readAllBytes(
      Paths.get(s"$invDir/nosta_vpts_20230311.csv")), "UTF-8")
    assert(daily == wantDaily, "daily output differs from golden")

    val monthly = gunzip(Paths.get(s"$bucket/baltrad/monthly/nosta/2023/nosta_vpts_202303.csv.gz"))
    val wantMonthly = gunzip(Paths.get(s"$invDir/nosta_vpts_202303.csv.gz"))
    assert(monthly == wantMonthly, "monthly output differs from golden")
  }

  test("end-to-end rebuild against a non-file:// object-store scheme (s3a seam)") {
    // no S3 endpoint / hadoop-aws exists offline; the s3a claim rests on
    // every IO going through Path.getFileSystem(conf) — proven here by
    // running the FULL rebuild (inventory read, DSv2 h5 scan on executors,
    // daily CSV sink, monthly gzip concat) against a custom mocks3://
    // scheme registered via the same fs.<scheme>.impl mechanism s3a uses
    spark.sparkContext.hadoopConfiguration.set(
      "fs.mocks3.impl", classOf[MockObjectStoreFileSystem].getName)
    val local = Files.createTempDirectory("mocks3lake").toString
    val bucket = s"mocks3://$local"
    val h5Dir = Paths.get(s"$local/baltrad/hdf5/nosta/2023/03/11")
    Files.createDirectories(h5Dir)
    Files.list(Paths.get(s"$invDir/vp")).forEach { f =>
      Files.copy(f, h5Dir.resolve(f.getFileName), StandardCopyOption.REPLACE_EXISTING)
    }
    val invLines = Files.list(h5Dir).sorted.toArray.map { f =>
      s"""dummy,baltrad/hdf5/nosta/2023/03/11/${f.asInstanceOf[java.nio.file.Path].getFileName},123,2023-03-12T00:00:00.000Z"""
    }
    Files.write(Paths.get(s"$local/inventory.csv"),
      invLines.mkString("\n").getBytes("UTF-8"))

    val (okDays, okMonths) = LakeController.run(
      spark, bucket, s"$bucket/inventory.csv", modifiedDaysAgo = 2,
      now = java.time.Instant.parse("2023-03-12T12:00:00Z"),
      coverageOut = Some(s"$bucket/coverage.csv"))
    assert(okDays == 1 && okMonths == 1)

    val daily = new String(Files.readAllBytes(
      Paths.get(s"$local/baltrad/daily/nosta/2023/nosta_vpts_20230311.csv")), "UTF-8")
    val wantDaily = new String(Files.readAllBytes(
      Paths.get(s"$invDir/nosta_vpts_20230311.csv")), "UTF-8")
    assert(daily == wantDaily, "daily output differs from golden via mocks3://")

    val monthly = gunzip(Paths.get(s"$local/baltrad/monthly/nosta/2023/nosta_vpts_202303.csv.gz"))
    assert(monthly == gunzip(Paths.get(s"$invDir/nosta_vpts_202303.csv.gz")),
      "monthly output differs from golden via mocks3://")
  }

  test("validate op reports zero errors on golden output and catches bad cells") {
    val df = graft.vpts.Vpts.vpts(spark, Seq(s"$invDir/vp"))
    val report = graft.vpts.Validate.validateVpts(df)
    assert(report.errors == 0, s"unexpected violations: ${report.byRule.filter(_._2 > 0)}")
    import org.apache.spark.sql.functions._
    val bad = df.withColumn("datetime", lit("not-a-date"))
      .withColumn("gap", lit("MAYBE"))
    val badReport = graft.vpts.Validate.validateVpts(bad)
    assert(badReport.byRule("datetime_format") == df.count())
    assert(badReport.byRule("gap_enum") == df.count())
  }
}
