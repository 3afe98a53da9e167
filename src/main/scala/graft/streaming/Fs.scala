package graft.streaming

/** Local-filesystem helpers shared by the streaming stores (KeyedTable
  * snapshot GC, band-index layer sweep) — one copy so a fix (stream
  * closing, retry semantics) cannot silently diverge between call sites.
  */
private[graft] object Fs {

  def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.foreach(deleteRecursively)
      } finally s.close()
    }
    java.nio.file.Files.deleteIfExists(p)
    ()
  }
}
