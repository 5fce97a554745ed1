package graft.mut

import javax.xml.parsers.DocumentBuilderFactory
import scala.collection.mutable

/** Driver-side CLDR keymap parsing (reference: gecko/_cldr.py). Uses
  * the JDK DOM parser (no external XML dependency). */
object Cldr {

  /** Decode CLDR escapes like `\u{22}` plus common XML/HTML entities
    * (reference: _cldr.py:10-33). */
  private[graft] def unescapeKbChar(raw: String): String = {
    val entities = Map("&quot;" -> "\"", "&amp;" -> "&", "&lt;" -> "<",
      "&gt;" -> ">", "&apos;" -> "'")
    val unescaped = entities.foldLeft(raw) { case (s, (e, c)) =>
      s.replace(e, c)
    }
    if (unescaped.startsWith("\\u")) {
      val re = """\\u\{([0-9a-fA-F]+)\}""".r
      re.replaceAllIn(unescaped, m =>
        new String(Character.toChars(Integer.parseInt(m.group(1), 16))))
    } else unescaped
  }

  /** ISO keyboard position "D03" → (row, col) (reference:
    * _cldr.py:36-41). */
  private[graft] def decodeIsoKbPos(iso: String): (Int, Int) =
    (iso.charAt(0) - 'A', iso.substring(1).toInt)

  /** 4-neighborhood plus shift-flip of a key position (reference:
    * _cldr.py:44-63). */
  private[graft] def neighborsOf(pos: (Int, Int, Int), maxRow: Int,
                               maxCol: Int): Seq[(Int, Int, Int)] = {
    val (r, c, m) = pos
    val out = mutable.ArrayBuffer[(Int, Int, Int)]()
    if (r > 0) out += ((r - 1, c, m))
    if (c > 0) out += ((r, c - 1, m))
    if (r < maxRow) out += ((r + 1, c, m))
    if (c < maxCol) out += ((r, c + 1, m))
    out += ((r, c, m ^ 1))
    out.toSeq
  }

  /** Parse a CLDR keymap XML to a char → sorted-candidate-string map
    * (reference: mutator.py:149-231). Only the unmodified and `shift`
    * keymaps are considered, as in the reference (:180-189). */
  def neighborCandidates(cldrPath: String,
                         charset: Option[String]): Map[Char, String] =
    neighborCandidates(new java.io.FileInputStream(cldrPath), charset)

  def neighborCandidates(in: java.io.InputStream,
                         charset: Option[String]): Map[Char, String] = {
    val dbf = DocumentBuilderFactory.newInstance()
    // CLDR files reference an external DTD; don't try to resolve it
    dbf.setFeature(
      "http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
    val doc = try dbf.newDocumentBuilder().parse(in) finally in.close()
    val keyMaps = doc.getElementsByTagName("keyMap")
    val posToChar = mutable.Map[(Int, Int, Int), Char]()
    var maxRow = 0
    var maxCol = 0

    (0 until keyMaps.getLength).foreach { i =>
      val km = keyMaps.item(i).asInstanceOf[org.w3c.dom.Element]
      val modAttr = Option(km.getAttribute("modifiers")).filter(_.nonEmpty)
      val mod = modAttr match {
        case None => Some(0)
        case Some("shift") => Some(1)
        case Some(_) => None
      }
      mod.foreach { kbMod =>
        val maps = km.getElementsByTagName("map")
        (0 until maps.getLength).foreach { j =>
          val mn = maps.item(j).asInstanceOf[org.w3c.dom.Element]
          val (row, colPos) = decodeIsoKbPos(mn.getAttribute("iso"))
          maxRow = math.max(maxRow, row)
          maxCol = math.max(maxCol, colPos)
          val ch = unescapeKbChar(mn.getAttribute("to"))
          if (ch.length == 1 &&
            charset.forall(_.contains(ch.charAt(0))))
            posToChar((row, colPos, kbMod)) = ch.charAt(0)
        }
      }
    }

    // iterate positions in row-major (row, col, modifier) order — the
    // reference's np.nditer scan (mutator.py:202-227) — so when the
    // same char sits on several keys (base vs shift layer), the winner
    // is the LAST position with a non-empty candidate set, exactly as
    // the reference's dict overwrite behaves (a HashMap iteration here
    // would pick a layout-dependent winner)
    val out = mutable.LinkedHashMap[Char, String]()
    posToChar.toSeq.sortBy(_._1).foreach { case (pos, ch) =>
      val cands = neighborsOf(pos, maxRow, maxCol)
        .flatMap(posToChar.get)
        .filter(_ != ch)
        .distinct.sorted.mkString
      if (cands.nonEmpty) out(ch) = cands
    }
    out.toMap
  }
}
