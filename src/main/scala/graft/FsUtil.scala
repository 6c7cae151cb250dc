package graft

import java.nio.file.{Files, Path, Paths}

/** Small shared filesystem helpers (one definition for the recursive
  * delete the benches, scratch dirs and store GC all need).
  */
object FsUtil {
  /** Delete `dir` and everything under it; missing paths are a no-op. */
  def deleteTree(dir: Path): Unit =
    if (Files.exists(dir))
      scala.util.Using.resource(Files.walk(dir)) { st =>
        st.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { Files.deleteIfExists(p); () })
      }

  def deleteTree(dir: String): Unit = deleteTree(Paths.get(dir))
}
