package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors for the Porter2 stemmer. Each expected value is either a
  * documented Snowball exception or hand-traced through the published
  * algorithm (region computation shown in Porter2.scala's scaladoc).
  */
class Porter2Spec extends AnyFunSuite {

  private val golden = Seq(
    // step 1a
    "caresses" -> "caress", "flies" -> "fli", "ties" -> "tie", "cries" -> "cri",
    "gaps" -> "gap", "gas" -> "gas", "kiwis" -> "kiwi", "cats" -> "cat",
    // step 1b incl. short-word e restoration and double undoubling
    "running" -> "run", "hopping" -> "hop", "hoping" -> "hope",
    "meeting" -> "meet", "agreed" -> "agre", "feed" -> "feed",
    // step 1c
    "happy" -> "happi", "by" -> "by", "say" -> "say", "cry" -> "cri",
    // steps 2-4
    "national" -> "nation", "rational" -> "ration",
    "conditional" -> "condit", "electricity" -> "electr",
    "generously" -> "generous", "generate" -> "generat",
    "organization" -> "organ", "happiness" -> "happi",
    "ability" -> "abil", "logical" -> "logic",
    "geology" -> "geolog", "radically" -> "radic",
    // exception list 1
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "early" -> "earli", "only" -> "onli", "news" -> "news",
    "sky" -> "sky", "bias" -> "bias",
    // exception list 2 (invariant after 1a)
    "inning" -> "inning", "outing" -> "outing", "canning" -> "canning",
    "herring" -> "herring", "proceed" -> "proceed", "exceed" -> "exceed",
    "succeed" -> "succeed",
    // short words untouched
    "a" -> "a", "be" -> "be", "on" -> "on")

  for ((in, out) <- golden)
    test(s"stem($in) == $out") { assert(Porter2.stem(in) == out) }

  test("null passes through") { assert(Porter2.stem(null) == null) }

  test("never throws and yields lowercase on arbitrary lowercase words") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val w = (1 to (1 + rnd.nextInt(12)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val s = Porter2.stem(w)
      assert(s != null && s.forall(c => c.isLower || !c.isLetter), s"word=$w stem=$s")
    }
  }

  test("stemming is a no-op on already-stemmed common words") {
    for (w <- Seq("run", "hope", "nation", "electr"))
      assert(Porter2.stem(w) == w)
  }
}
