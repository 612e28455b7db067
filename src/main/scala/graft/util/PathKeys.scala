package graft.util

/** Staging-location keying shared by every on-disk fixture/layout the
  * engine derives from a source directory: basename alone collides when
  * two roots share it (/a/sf0.1 vs /b/sf0.1), so derived paths carry a
  * hash of the full absolute path. */
object PathKeys {
  def pathKey(dir: String): String =
    f"${java.nio.file.Paths.get(dir).toAbsolutePath.toString.hashCode}%08x"

  /** `<basename>-<key>`: collision-free, still human-readable. */
  def keyedName(dir: String): String =
    s"${java.nio.file.Paths.get(dir).getFileName}-${pathKey(dir)}"
}
