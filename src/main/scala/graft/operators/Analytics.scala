package graft.operators

import graft.QueryDef

object Analytics {
  val entries: Seq[QueryDef] = Seq()
}
