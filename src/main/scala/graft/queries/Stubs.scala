package graft.queries

// Families filled in incrementally; each moves to its own file as it
// gains entries.
object TextOps { def entries: Seq[Entry] = Seq() }
object DedupOps { def entries: Seq[Entry] = Seq() }
object VectorOps { def entries: Seq[Entry] = Seq() }
object MultimodalOps { def entries: Seq[Entry] = Seq() }
object StreamingOps { def entries: Seq[Entry] = Seq() }
