package graft.streaming

/** Local-filesystem helpers shared by the streaming stores (KeyedTable
  * snapshot GC, band-index layer sweep) — one copy so a fix (stream
  * closing, retry semantics) cannot silently diverge between call sites.
  */
private[graft] object Fs {

  /** Batch-layer ids present under a layer root (dirs named `batch=<id>`)
    * — shared by the band index and the pack store, whose append-only
    * layer layouts are deliberately identical.
    */
  def layerIds(root: java.nio.file.Path): Seq[Long] =
    if (!java.nio.file.Files.isDirectory(root)) Seq.empty
    else {
      val s = java.nio.file.Files.list(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .collect { case n if n.matches("batch=-?\\d+") => n.drop(6).toLong }
          .toSeq
      } finally s.close()
    }

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
