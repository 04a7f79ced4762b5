package graft

/** Per-(tag, user, source-dir, PROCESS) scratch layout roots under the
  * JVM temp dir, swept on exit — the ONE spelling for every query that
  * writes a physical artifact as part of its body (q233's compacted
  * index layout, q238's sketch-ladder artifact; factored so a second
  * consumer doesn't re-grow the isolation bugs the r19 review found
  * inline): the path is stable WITHIN a process, so warm bench/verify
  * reruns overwrite one layout instead of accumulating a temp copy per
  * invocation, and unique ACROSS processes via the pid component, so
  * two concurrent harness runs as the same user never Overwrite each
  * other's layout mid-read. Everything registered here is removed at
  * JVM exit.
  */
object Scratch {

  private lazy val sweeper: java.util.concurrent.ConcurrentHashMap[
      String, Boolean] = {
    val dirs = new java.util.concurrent.ConcurrentHashMap[
      String, Boolean]()
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        java.nio.file.Files.deleteIfExists(f.toPath); ()
      }
      dirs.keySet().forEach(p => rm(new java.io.File(p)))
    }))
    dirs
  }

  /** A process-scoped scratch layout path: `<tmp>/graft_<tag>_<user>_
    * <hash(dir)>_p<pid>/<leaf>`, registered for exit-time sweep.
    */
  def layout(tag: String, dir: String, leaf: String): String = {
    val root = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft_${tag}_${System.getProperty("user.name", "anon")}_" +
        f"${scala.util.hashing.MurmurHash3.stringHash(dir)}%08x" +
        s"_p${ProcessHandle.current().pid()}").getPath
    sweeper.put(root, true)
    s"$root/$leaf"
  }
}
