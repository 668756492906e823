package graft.operators

import java.nio.file.{Files, Path, StandardCopyOption}

/** Stage-once directory protocol shared by the bench/demo entries that
  * materialize a reusable on-disk corpus or index under /tmp (the ODIM
  * ingest corpus, the incremental-dedup band index).
  *
  * The builder populates a FRESH temp sibling which is atomically renamed
  * into place once complete, so a half-staged directory is never observable
  * and concurrent first runs are safe: every contender builds its own temp
  * dir, exactly one rename wins, losers delete their copy and read the
  * winner's. The `_STAGED` marker gates reuse across processes; a marker-less
  * root (a remnant of a crashed pre-protocol run) is discarded and rebuilt.
  */
object Staging {

  def stagedDir(root: Path)(build: Path => Unit): String = {
    val done = root.resolve("_STAGED")
    if (!Files.exists(done)) {
      if (Files.exists(root)) deleteRecursively(root) // stale partial remnant
      Files.createDirectories(root.getParent)
      val tmp = Files.createTempDirectory(root.getParent, root.getFileName.toString + ".build")
      build(tmp)
      Files.createFile(tmp.resolve("_STAGED"))
      try Files.move(tmp, root, StandardCopyOption.ATOMIC_MOVE): Unit
      catch {
        case _: java.nio.file.FileAlreadyExistsException |
            _: java.nio.file.DirectoryNotEmptyException |
            _: java.nio.file.AccessDeniedException =>
          deleteRecursively(tmp) // lost the race; the winner's dir is complete
      }
    }
    root.toString
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively(_))
      finally s.close()
    }
    Files.deleteIfExists(p): Unit
  }
}
