package graft.cli

import graft.vpts.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths, StandardCopyOption}

class CliSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  test("transferBaltrad sync: F3 filter + F4 anti-join + lake layout copy") {
    val src = Files.createTempDirectory("ftp")
    val dst = Files.createTempDirectory("lake")
    // stage: 2 VP files + 1 PVOL (must be ignored)
    val vpDir = Paths.get("/root/reference/tests/data/inventory/vp")
    val vps = Files.list(vpDir).sorted.toArray.take(2)
      .map(_.asInstanceOf[java.nio.file.Path])
    vps.foreach(f => Files.copy(f, src.resolve(f.getFileName)))
    Files.copy(Paths.get("/root/reference/tests/data/odimh5/bewid_pvol_20170214T0000Z_0x1.h5"),
      src.resolve("bewid_pvol_20170214T0000Z_0x1.h5"))

    val n1 = TransferBaltrad.sync(spark, src.toString, dst.toString, "baltrad")
    assert(n1 == 2) // PVOL filtered out
    assert(Files.exists(dst.resolve(
      s"baltrad/hdf5/nosta/2023/03/11/${vps(0).getFileName}")))

    // second run: everything already transferred -> anti-join empties the diff
    val n2 = TransferBaltrad.sync(spark, src.toString, dst.toString, "baltrad")
    assert(n2 == 0)

    // a new file appears -> only it is transferred
    val extra = Files.list(vpDir).sorted.toArray.drop(2).head.asInstanceOf[java.nio.file.Path]
    Files.copy(extra, src.resolve(extra.getFileName), StandardCopyOption.REPLACE_EXISTING)
    assert(TransferBaltrad.sync(spark, src.toString, dst.toString, "baltrad") == 1)
  }
}
