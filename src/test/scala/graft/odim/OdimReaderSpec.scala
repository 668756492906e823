package graft.odim

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Port of the reference's reader metadata assertions
  * (tests/test_odimh5.py:18-137) against the same PVOL fixture.
  */
class OdimReaderSpec extends AnyFunSuite {

  lazy val pvol: OdimReader = OdimReader(
    Files.readAllBytes(Paths.get(
      "/root/reference/tests/data/odimh5/bewid_pvol_20170214T0000Z_0x1.h5")),
    "bewid_pvol_20170214T0000Z_0x1.h5")

  test("root date/time/object strings") {
    assert(pvol.what("date") == "20170214")
    assert(pvol.what("time") == "000016")
    assert(pvol.what("object") == "PVOL")
    assert(pvol.dateTimeIso == "2017-02-14T00:00:16Z")
  }

  test("root source parsed to identifier map") {
    assert(pvol.what("source") ==
      "WMO:06477,RAD:BX41,PLC:Wideumont,NOD:bewid,CTY:605,CMT:VolumeScanZ")
    assert(pvol.sourceIdentifiers == Map(
      "WMO" -> "06477", "RAD" -> "BX41", "PLC" -> "Wideumont",
      "NOD" -> "bewid", "CTY" -> "605", "CMT" -> "VolumeScanZ"))
  }

  test("what/where/how attribute maps match the reference assertions") {
    assert(pvol.what == Map(
      "date" -> "20170214", "object" -> "PVOL",
      "source" -> "WMO:06477,RAD:BX41,PLC:Wideumont,NOD:bewid,CTY:605,CMT:VolumeScanZ",
      "time" -> "000016", "version" -> "H5rad 2.2"))
    assert(pvol.where == Map("height" -> 590.0, "lat" -> 49.9143, "lon" -> 5.5056))
    assert(pvol.how == Map(
      "beamwidth" -> 1.0, "endepochs" -> 1487030428L, "highprf" -> 600L,
      "lowprf" -> 0L, "software" -> "RAINBOW 5.42.9",
      "startepochs" -> 1487030681L, "system" -> "GEMA500", "wavelength" -> 5.25))
  }

  test("dataset names: 11 datasets, dataset1..dataset11") {
    val names = pvol.h5.rootChildren.keySet.filter(_.startsWith("dataset"))
    assert(names.size == 11)
    assert(names.contains("dataset1") && names.contains("dataset11"))
    assert(!names.contains("dataset12"))
  }
}
