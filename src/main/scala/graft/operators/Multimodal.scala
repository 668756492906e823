package graft.operators

import graft.QueryDef

object Multimodal {
  val entries: Seq[QueryDef] = Seq()
}
