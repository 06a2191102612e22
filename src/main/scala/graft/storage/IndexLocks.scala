package graft.storage

/** Per-layout writer locks for the stored-index maintenance ops — the
  * P13 per-topic-single-writer rule applied to index layouts, and the
  * JVM-enforced half of their single-writer contract
  * ([[graft.streaming.ReplicaLocks]]' twin; AnnIndexStore already has
  * its own): two maintenance ops on the SAME path in one JVM serialize
  * instead of racing version numbers (both would read version v and
  * publish v+1, the second silently orphaning the first's epoch).
  * Readers never take this lock — a loaded index is an immutable
  * snapshot. Cross-PROCESS writers still need an external coordinator,
  * exactly like the replica (documented on both).
  */
object IndexLocks {
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  def lockFor(path: String): Object =
    locks.computeIfAbsent(path, _ => new Object)
}
