package graft.operators

import graft.QueryDef

object Similarity {
  val entries: Seq[QueryDef] = Seq()
}
