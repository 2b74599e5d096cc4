package graft.util

/** Tiny shared IO/text helpers — single definitions for logic that was
  * previously duplicated across mains and sources (a fix applied to one
  * copy silently missed the other).
  */
object IoUtil {

  /** Escape `s` as the CONTENT of a JSON string literal (quotes included):
    * backslash, quote, and ALL control chars below 0x20 — a stray tab or
    * CR would otherwise make a driver-side `json.load` fail.
    */
  def jsonString(s: String): String =
    "\"" + Option(s).getOrElse("").flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Recursive delete; missing paths are a no-op. */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
