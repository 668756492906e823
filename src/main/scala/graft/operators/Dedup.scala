package graft.operators

import graft.QueryDef

object Dedup {
  val entries: Seq[QueryDef] = Seq()
}
