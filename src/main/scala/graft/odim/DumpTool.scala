package graft.odim

/** Debug CLI: dump an HDF5/ODIM file's structure (dev aid, not part of the
  * query surface).
  */
object DumpTool {
  def main(args: Array[String]): Unit = {
    val f = Hdf5File.read(args(0))
    println(s"offsets=${f.offsetSize} lengths=${f.lengthSize} root=${f.rootHeaderAddr}")
    def walk(name: String, addr: Long, depth: Int): Unit = {
      val attrs = f.attributes(addr)
      val kids = f.groupChildren(addr)
      val pad = "  " * depth
      println(s"$pad$name/")
      attrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
        val vs = v match {
          case s: Seq[_] => s.take(4).mkString("[", ",", ",...]")
          case other => other.toString.take(60)
        }
        println(s"$pad  @$k = $vs (${v.getClass.getSimpleName})")
      }
      if (depth < 3)
        kids.toSeq.sortBy(_._1).foreach { case (k, a) =>
          if (f.objectHeader(a).exists(_.typ == 0x0008)) {
            val d = f.dataset(a)
            println(s"$pad  $k: dataset dims=${d.dims.mkString("x")} int=${d.isInteger} " +
              s"head=${d.values.take(5).mkString(",")}")
          } else walk(k, a, depth + 1)
        }
    }
    walk("", f.rootHeaderAddr, 0)
  }
}
