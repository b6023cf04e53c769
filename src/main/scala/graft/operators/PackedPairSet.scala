package graft.operators

/** Primitive open-addressing hash set over POSITIVE packed longs — the
  * driver-local dedup structure behind `preDeduped = false` in
  * [[Triangles.perNode]] and [[KCore.peel]].
  *
  * Both graph fast paths dedupe a collected pair stream keyed by two
  * dense-remapped int ids packed into one long (`min << 32 | max`,
  * always ≥ 1 because the dense ids of an edge's endpoints differ).
  * A boxed `java.util.HashSet[java.lang.Long]` costs ~0.6 s per
  * million pairs here (two allocations per add — the box and the
  * node — is pure GC churn at the gate SF, measured as the entire
  * win of skipping the distinct exchange given back); this table is
  * a flat `Array[Long]` with linear probing and a 64-bit finalizer
  * hash — no allocation per add, ~20 ns/op.
  *
  * Load factor ≤ 0.5 by construction (capacity = next power of two
  * ≥ 2·expected, grown by doubling), slot 0 reserved as the empty
  * sentinel (legal because every packed key is ≥ 1).
  */
private[operators] final class PackedPairSet(expected: Int) {
  private var cap =
    java.lang.Integer.highestOneBit(math.max(16, expected) - 1) << 2
  private var mask = cap - 1
  private var table = new Array[Long](cap)
  private var size = 0

  // Stafford variant 13 of the murmur64 finalizer — full-avalanche,
  // so linear probing stays clustered-free on sequential dense ids
  private def hash(k: Long): Int = {
    var h = k
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    (h ^ (h >>> 31)).toInt
  }

  /** true iff `key` (must be ≥ 1) was not present; inserts it. */
  def add(key: Long): Boolean = {
    var i = hash(key) & mask
    var slot = table(i)
    while (slot != 0L) {
      if (slot == key) return false
      i = (i + 1) & mask
      slot = table(i)
    }
    table(i) = key
    size += 1
    if (size * 2 > cap) grow()
    true
  }

  private def grow(): Unit = {
    val old = table
    cap <<= 1
    mask = cap - 1
    table = new Array[Long](cap)
    var j = 0
    while (j < old.length) {
      val k = old(j)
      if (k != 0L) {
        var i = hash(k) & mask
        while (table(i) != 0L) i = (i + 1) & mask
        table(i) = k
      }
      j += 1
    }
  }
}
