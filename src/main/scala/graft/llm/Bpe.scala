package graft.llm

/** FROZEN REFERENCE BPE merge table: 64 merges trained on the sf0.01
  * documents table (standard BPE induction, Sennrich et al. 2016: per
  * round, merge the corpus-wide most frequent adjacent symbol pair;
  * deterministic tie-break). The FIRST entry is by construction
  * q97_bpe_pairs' top-1 merge candidate. Kept as the pinned snapshot
  * BpeTrainSpec proves the distributed trainer reproduces; the APPLY
  * path (q99) serves the in-engine-trained [[BpeServe]] artifact
  * instead (IvfCodebook's round-8 pattern). To regenerate this
  * snapshot, dump `BpeTrain.train(s, dir, rounds = 64)`.
  */
object Bpe {
  val merges: Vector[(String, String)] = Vector(
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),
    ("a", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    ("j", "o"),
    ("jo", "in"),
    ("a", "s"),
    ("as", "h"),
    ("h", "ash"),
    ("r", "ow"),
    ("at", "c"),
    ("atc", "h"),
    ("b", "atch"),
    ("a", "n"),
    ("c", "an"),
    ("s", "can"),
    ("c", "o"),
    ("co", "lu"),
    ("colu", "m"),
    ("colum", "n"),
    ("c", "u"),
    ("cu", "st"),
    ("cust", "o"),
    ("custo", "mer"),
    ("f", "i"),
    ("fi", "l"),
    ("fil", "t"),
    ("filt", "er"),
    ("a", "l"),
    ("al", "l"),
    ("m", "all"),
    ("s", "mall"),
    ("g", "e"),
    ("l", "ow"),
    ("mer", "ge"),
    ("s", "low"),
    ("c", "t"),
    ("ct", "or"),
    ("d", "er"),
    ("e", "ctor"),
    ("or", "der"),
    ("v", "ector"),
    ("in", "e"),
    ("l", "ine"),
    ("a", "b"),
    ("ab", "l"),
    ("abl", "e"),
    ("at", "a"),
    ("d", "ata"),
    ("t", "able"),
    ("u", "p"),
    ("a", "g"),
    ("ag", "g"),
    ("a", "lu"),
    ("alu", "e"),
    ("v", "alue"),
    ("e", "y"),
    ("k", "ey"))

  private val rank: Map[(String, String), Int] =
    merges.iterator.zipWithIndex.toMap

  /** Standard BPE apply: start from single characters, repeatedly
    * rewrite ALL occurrences of the best-ranked (earliest-trained)
    * adjacent pair present, left to right, until no table pair
    * applies. Pure and total — unknown characters simply never merge.
    */
  def encode(token: String): Array[String] = encodeWith(token, rank, merges)

  /** Apply with an explicit table — lets specs golden-test the
    * algorithm against tiny hand-computed tables. */
  def encodeWith(token: String,
      rk: Map[(String, String), Int],
      tbl: Vector[(String, String)]): Array[String] = {
    if (token.isEmpty) return Array.empty
    var syms: Array[String] = token.map(_.toString).toArray
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rk.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = tbl(best)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += a + b; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
      }
    }
    syms
  }

  /** encode() with pieces space-joined — the Catalyst expression's
    * return shape (tokens are whitespace-split upstream, so ' ' can
    * never occur inside a piece). */
  def encodeJoined(token: String): String = encode(token).mkString(" ")

  /** A parsed merge table as one serializable value — what the
    * table-parameterized expression ships to executors. */
  final case class Table(rank: Map[(String, String), Int],
                         tbl: Vector[(String, String)]) extends Serializable

  /** Wire format for a merge table inside a plan literal: one
    * "lhs rhs" line per merge, training order. Unambiguous because
    * tokens are whitespace-split upstream — no piece can contain a
    * space or newline. */
  def toSpec(tbl: Seq[(String, String)]): String =
    tbl.map { case (a, b) => s"$a $b" }.mkString("\n")

  def parseSpec(spec: String): Table = {
    val pairs = spec.split("\n").iterator.filter(_.nonEmpty).map { l =>
      val i = l.indexOf(' ')
      (l.substring(0, i), l.substring(i + 1))
    }.toVector
    Table(pairs.iterator.zipWithIndex.toMap, pairs)
  }

  def encodeJoinedWith(token: String, t: Table): String =
    encodeWith(token, t.rank, t.tbl).mkString(" ")
}
