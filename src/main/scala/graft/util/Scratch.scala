package graft.util

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Per-JVM scratch directories that clean themselves up: unique paths
  * keep concurrent runs from interleaving writes (the round-6 w2 hazard),
  * and the shutdown hook keeps repeated bench/gate/test JVMs from growing
  * /tmp without bound (each run would otherwise strand its parquet/JSONL
  * publish artifacts forever). Deletion runs at JVM exit — after every
  * Spark action that could still be reading the files. */
object Scratch {
  /** Register `path` for recursive deletion at JVM exit; returns it. */
  def deleteOnExit(path: String): String = {
    sys.addShutdownHook {
      val p = Paths.get(path)
      if (Files.exists(p))
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
    }
    path
  }
}
