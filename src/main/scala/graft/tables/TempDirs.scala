package graft.tables

import java.nio.file.{Files, Path}

/** Temp directories for query fixtures (tables written through the storage
  * engine, streaming checkpoints, bench ingest roots), deleted on JVM
  * exit. Fixture dirs run to gigabytes (the variant table alone is ~1.2 GB
  * at sf0.1); without the hook every Verify/Bench invocation leaks its
  * fixtures and repeated driver rounds fill the disk.
  */
object TempDirs {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach { p =>
      try deleteRecursively(p.toFile)
      catch { case _: Throwable => () } // exit-time best effort
    }
  }))

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** A fresh temp directory removed (recursively) at JVM shutdown. */
  def create(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }
}
