package graft.operators

import graft.QueryDef

object VptsOps {
  val entries: Seq[QueryDef] = Seq()
}
