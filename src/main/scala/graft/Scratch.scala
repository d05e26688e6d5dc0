package graft

/** JVM-lifetime scratch directories for gates and store fallbacks.
  *
  * Gate bodies and the warehouse-less store paths need throwaway disk that
  * may still be READ lazily after the creating function returns (a returned
  * DataFrame scans it when the driver collects), so eager deletion is
  * unsafe; before round 13 these simply leaked a parquet tree into /tmp per
  * run (round-12 advice). A shutdown hook per directory is the correct
  * lifetime: alive for the whole session, gone when the JVM exits.
  */
object Scratch {
  def dir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p.toFile)))
    p.toString
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }
}
