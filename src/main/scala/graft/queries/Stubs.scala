package graft.queries

import graft.GQuery

// Phase placeholders — each object graduates to its own file as its
// SURVEY §2 table is implemented (§7.2 build order).
object NorthStar { def all: Seq[GQuery] = Seq.empty }
object Streaming { def all: Seq[GQuery] = Seq.empty }
