package graft.queries

import graft.GQuery

// Phase placeholder — graduates to its own file with SURVEY §7.2
// phase 5 (streaming batch-equivalents).
object Streaming { def all: Seq[GQuery] = Seq.empty }
