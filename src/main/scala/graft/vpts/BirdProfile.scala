package graft.vpts

import graft.odim.{Hdf5File, OdimReader}

/** One decoded cell of a profile variable: a typed number or a missing-data
  * sentinel. The reference deliberately mixes numbers and sentinel strings in
  * one Python list (`vpts.py:43-46,64`); an ADT is the typed equivalent.
  */
sealed trait VpCell
object VpCell {
  final case class I(v: Long) extends VpCell
  final case class F(v: Double) extends VpCell
  case object NoData extends VpCell
  case object Undetect extends VpCell

  /** Render with python-str parity; sentinels via the version's strings. */
  def render(c: VpCell, nodata: String, undetect: String): String = c match {
    case I(v) => v.toString
    case F(v) => PyFormat.pyFloat(v)
    case NoData => nodata
    case Undetect => undetect
  }
}

/** One source file = one radar x one timestamp x N altitude levels
  * (`vpts.py:70-106`). Plain JVM object — decoding happens inside
  * mapPartitions on executors; only the projected string rows cross into
  * the DataFrame world.
  */
final case class BirdProfile(
    identifiers: Map[String, String],
    datetimeIso: String,
    what: Map[String, Any],
    where: Map[String, Any],
    how: Map[String, Any],
    levels: Seq[Long],
    variables: Map[String, Seq[VpCell]],
    sourceFile: String)

object BirdProfile {

  /** Decode one quantity: value = raw*gain+offset cast back to the raw
    * dtype (int stays int, f32 stays f32-precise), then sentinel
    * substitution against the *unscaled* nodata/undetect attrs — exactly
    * the reference's order of operations (`vpts.py:27-67`).
    */
  private def decodeQuantity(h5: Hdf5File, whatAddr: Long, dataAddr: Long): Seq[VpCell] = {
    val attrs = h5.attributes(whatAddr)
    def num(k: String): Double = attrs(k) match {
      case d: Double => d
      case l: Long => l.toDouble
      case o => o.toString.toDouble
    }
    val gain = num("gain"); val offset = num("offset")
    val nodata = num("nodata"); val undetect = num("undetect")
    val ds = h5.dataset(dataAddr)
    ds.values.toSeq.map { raw =>
      val scaled = raw * gain + offset
      if (ds.isInteger) {
        val v = scaled.toLong // numpy astype(int) truncates toward zero
        if (v.toDouble == nodata) VpCell.NoData
        else if (v.toDouble == undetect) VpCell.Undetect
        else VpCell.I(v)
      } else {
        // fixture data is f32; the f32 cast then exact widening reproduces
        // tolist()'s doubles. (f64 data round-trips unchanged.)
        val v = if (ds.elemSize == 4) scaled.toFloat.toDouble else scaled
        if (v == nodata) VpCell.NoData
        else if (v == undetect) VpCell.Undetect
        else VpCell.F(v)
      }
    }
  }

  /** `BirdProfile.from_odim` (`vpts.py:138-177`): map quantity -> datasetN,
    * split HGHT into the levels axis, decode every other quantity.
    */
  def fromOdim(reader: OdimReader, sourceFile: String): BirdProfile = {
    val h5 = reader.h5
    val ds1 = h5.resolve("dataset1").getOrElse(
      throw new graft.odim.InvalidSourceOdim(s"${reader.fileName}: no dataset1"))
    val children = h5.groupChildren(ds1)
    // quantity name -> (what addr, data addr)
    val byQuantity: Map[String, (Long, Long)] = children.collect {
      case (name, addr) if name != "what" =>
        val kids = h5.groupChildren(addr)
        val whatAddr = kids("what")
        val q = h5.attributes(whatAddr)("quantity").toString
        q -> (whatAddr, kids("data"))
    }
    val heights = decodeQuantity(h5, byQuantity("HGHT")._1, byQuantity("HGHT")._2)
    val levels = heights.map {
      case VpCell.I(v) => v
      case VpCell.F(v) => v.toLong
      case other => sys.error(s"sentinel height value $other")
    }
    val variables = (byQuantity - "HGHT").map { case (q, (w, d)) =>
      q -> decodeQuantity(h5, w, d)
    }
    BirdProfile(
      identifiers = reader.sourceIdentifiers,
      datetimeIso = reader.dateTimeIso,
      what = reader.what, where = reader.where, how = reader.how,
      levels = levels,
      variables = variables,
      sourceFile = sourceFile)
  }
}
