package graft.core

/** Run-once lazy holder for use INSIDE ConcurrentHashMap.computeIfAbsent:
  * the mapping function only allocates the slot (cheap, inside the bin
  * lock); the expensive body runs at first `.value` access, outside the
  * lock — so a long computation can't block unrelated same-bin lookups or
  * deadlock a reentrant one. [[Materialize]]'s internal slot is the same
  * shape specialized for parquet-path cleanup; this is the generic form
  * for cached driver-side values (e.g. BpeOps' trained merge lists).
  */
final class LazySlot[T](body: () => T) {
  lazy val value: T = body()
}
