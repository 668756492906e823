package graft.operators

import graft.QueryDef

object TextOps {
  val entries: Seq[QueryDef] = Seq()
}
