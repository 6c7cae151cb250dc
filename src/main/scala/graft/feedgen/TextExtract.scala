package graft.feedgen

import java.nio.charset.StandardCharsets

/** The single pure html→text extraction function (SURVEY §7.4: "make
  * extraction a single pure function used by both feedgen and any
  * re-derivation; binary-safe comparison in tests").
  *
  * `render` and `extract` are exact inverses on the text payload:
  * for any title and paragraph list,
  *   extract(render(title, paras)) == (title +: paras).mkString("\n")
  * including empty strings, emoji, and arbitrary UTF-8 (the reference
  * sample data carries emoji/URL texts — /root/reference/data/telegram.db).
  *
  * Kept deliberately free of java.util regex state and locale
  * dependence so the byte-identity invariant survives re-derivation on
  * any executor.
  */
object TextExtract {

  private def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case c   => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")

  /** Deterministically render a synthetic page. The text payload is the
    * title line followed by one line per paragraph.
    */
  def render(title: String, paras: Seq[String]): Array[Byte] = {
    val sb = new StringBuilder(256)
    sb.append("<!doctype html><html><head><meta charset=\"utf-8\"><title>")
    sb.append(escape(title))
    sb.append("</title></head><body>")
    paras.foreach { p => sb.append("<p>").append(escape(p)).append("</p>") }
    sb.append("</body></html>")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** Extract the text payload back out of the page bytes. Pure; no
    * normalization of any kind (byte-identity requirement).
    */
  def extract(html: Array[Byte]): String = {
    if (html == null) return null
    val s = new String(html, StandardCharsets.UTF_8)
    val out = new StringBuilder(s.length)
    var n = 0 // element counter — an empty title must still claim line 0
    def sliceAll(open: String, close: String): Unit = {
      var from = 0
      var continue = true
      while (continue) {
        val i = s.indexOf(open, from)
        if (i < 0) continue = false
        else {
          val j = s.indexOf(close, i + open.length)
          if (j < 0) continue = false
          else {
            if (n > 0) out.append('\n')
            n += 1
            out.append(unescape(s.substring(i + open.length, j)))
            from = j + close.length
          }
        }
      }
    }
    sliceAll("<title>", "</title>")
    sliceAll("<p>", "</p>")
    out.toString
  }
}
