package graft.tools

/** Shared splitmix64 finalizer — THE deterministic bit source of the
  * fixture generators (seed → byte-stable fixtures; no RNG state).
  * One definition so a typo can't silently change a single fixture's
  * determinism contract; generators predating the hoist keep their
  * byte-identical private copies (their committed parquet pins them).
  */
object Mix64 {
  def apply(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
