package graft.queries

// Families filled in incrementally; each moves to its own file as it
// gains entries.
object StreamingOps { def entries: Seq[Entry] = Seq() }
