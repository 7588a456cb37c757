package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Session-scoped staging-directory registry.
  *
  * Operators that stage artifacts on local disk (bucketed index
  * tables, roundtrip trees, streaming sources/checkpoints, FASTQ
  * fixtures) allocate their directories here instead of calling
  * `Files.createTempDirectory` directly. Callers memoize the dirs
  * for the life of the JVM — they are build-once index artifacts,
  * so per-call deletion would defeat the memo — but a long-lived
  * session must not leave the trees behind after exit. One JVM
  * shutdown hook deletes everything allocated through this
  * registry; a crash leaves at most the standard tmp-reaper
  * situation, which per-call cleanup could not improve on either.
  *
  * The hook registers through Hadoop's ShutdownHookManager at a
  * priority below Spark's (SparkContext stops at 50, its temp dirs
  * at 25), so staged trees — streaming checkpoints, bucketed table
  * paths — are deleted only AFTER Spark's own stop/commit hooks have
  * finished with them; a raw Runtime hook would race them unordered.
  */
object Staging {
  private val dirs = scala.collection.concurrent.TrieMap.empty[Path, Unit]

  org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(() => {
    dirs.keys.foreach { root =>
      try {
        val walk = Files.walk(root)
        try
          walk.sorted(Comparator.reverseOrder[Path]()).forEach { p =>
            try Files.deleteIfExists(p)
            catch { case _: Exception => () }
          }
        finally walk.close()
      } catch { case _: Exception => () }
    }
  }, 10) // below Spark's temp-dir priority (25): run after Spark stops

  /** A fresh temp directory, deleted (recursively) at JVM exit. */
  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    dirs.put(p, ())
    p.toString
  }
}
