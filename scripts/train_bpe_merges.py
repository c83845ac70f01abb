#!/usr/bin/env python3
"""Regenerate the frozen merge table in src/main/scala/graft/llm/Bpe.scala.

Runs real byte-pair-encoding vocabulary induction (Sennrich et al. 2016)
over the sf0.01 documents table: symbols start as single characters
within whitespace tokens (no end-of-word marker — the corpus is
synthetic word soup), each round merges the globally most frequent
adjacent symbol pair (ties broken lexicographically so the table is
deterministic), 64 rounds. The first round's winning pair is by
construction q97_bpe_pairs' top-1 candidate. Driver-side tooling only
(duckdb is not a dependency of the Scala library).
"""
import collections
import duckdb

ROUNDS = 64
SRC = "/root/testdata/sf0.01/documents.parquet"
OUT = "/root/repo/src/main/scala/graft/llm/Bpe.scala"

con = duckdb.connect()
rows = con.sql(f"select text from '{SRC}' order by doc_id").fetchall()
words = collections.Counter()
for (text,) in rows:
    for tok in text.strip().split():
        words[tok] += 1

vocab = {tuple(w): c for w, c in words.items()}
merges = []
for _ in range(ROUNDS):
    pairs = collections.Counter()
    for syms, c in vocab.items():
        for i in range(len(syms) - 1):
            pairs[(syms[i], syms[i + 1])] += c
    if not pairs:
        break
    best = max(pairs.items(), key=lambda kv: (kv[1], [-ord(ch) for p in kv[0] for ch in p]))
    # deterministic tie-break: highest count, then lexicographically
    # smallest pair (the max() key above inverts char codes for that)
    (a, b), _ = best
    merges.append((a, b))
    new_vocab = {}
    for syms, c in vocab.items():
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
    vocab = new_vocab


def esc(s):
    return s.replace("\\", "\\\\").replace('"', '\\"')


pairs_src = ",\n    ".join(
    f'("{esc(a)}", "{esc(b)}")' for a, b in merges)
with open(OUT, "w") as f:
    f.write(f'''package graft.llm

/** Frozen BPE merge table: {len(merges)} merges trained on the sf0.01
  * documents table (scripts/train_bpe_merges.py — standard BPE
  * induction, Sennrich et al. 2016: per round, merge the corpus-wide
  * most frequent adjacent symbol pair; deterministic tie-break). The
  * FIRST entry is by construction q97_bpe_pairs' top-1 merge
  * candidate; q99_bpe_apply applies the whole table. Frozen to
  * literals (IvfCodebook precedent) so the apply step is a pure
  * deterministic function both engines and every spec agree on.
  * Regenerate with the script if the testdata changes.
  */
object Bpe {{
  val merges: Vector[(String, String)] = Vector(
    {pairs_src})

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
      tbl: Vector[(String, String)]): Array[String] = {{
    if (token.isEmpty) return Array.empty
    var syms: Array[String] = token.map(_.toString).toArray
    var done = false
    while (!done && syms.length > 1) {{
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {{
        val r = rk.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }}
      if (best == Int.MaxValue) done = true
      else {{
        val (a, b) = tbl(best)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {{
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {{
            out += a + b; j += 2
          }} else {{ out += syms(j); j += 1 }}
        }}
        syms = out.toArray
      }}
    }}
    syms
  }}

  /** encode() with pieces space-joined — the Catalyst expression's
    * return shape (tokens are whitespace-split upstream, so ' ' can
    * never occur inside a piece). */
  def encodeJoined(token: String): String = encode(token).mkString(" ")
}}
''')
print(f"wrote {OUT} with {len(merges)} merges; first 8: {merges[:8]}")
