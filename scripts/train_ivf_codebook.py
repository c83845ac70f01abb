#!/usr/bin/env python3
"""Regenerate src/main/scala/graft/llm/IvfCodebook.scala.

Trains the IVF coarse codebook for q55_knn_ivf: plain Lloyd k-means
(k=32, init = first 32 vectors, 20 iterations) over the sf0.01
embeddings table, centroid values rounded to 6 decimals so the frozen
decimal literals parse to identical doubles in both Spark (Scala) and
the DuckDB oracle. Driver-side tooling only (duckdb/numpy are not
dependencies of the Scala library).
"""
import duckdb
import numpy as np

K = 32
ITERS = 20
SRC = "/root/testdata/sf0.01/embeddings.parquet"
OUT = "/root/repo/src/main/scala/graft/llm/IvfCodebook.scala"

df = duckdb.connect().sql(
    f"select vec_id, embedding from '{SRC}' order by vec_id").df()
E = np.array([np.array(e, dtype=np.float64) for e in df.embedding])

cents = E[:K].copy()
for _ in range(ITERS):
    d2 = ((E[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    a = d2.argmin(1)
    for c in range(K):
        m = E[a == c]
        if len(m):
            cents[c] = m.mean(0)
cents = np.round(cents, 6)

rows = []
for c in cents:
    vals = ", ".join(repr(float(x)) for x in c)
    rows.append(f"    Array({vals})")

src = (
    "package graft.llm\n\n"
    "/** IVF coarse codebook: 32 k-means centroids (Lloyd, init = first 32\n"
    "  * vectors of sf0.01 embeddings, 20 iterations, values rounded to 6\n"
    "  * decimals) frozen to literals so the assignment is deterministic and\n"
    "  * the DuckDB oracle sees bit-identical centroids. Regenerate with\n"
    "  * scripts/train_ivf_codebook.py if the testdata changes.\n"
    "  */\n"
    "object IvfCodebook {\n"
    f"  val Cells = {K}\n"
    "  val centroids: Array[Array[Double]] = Array(\n"
    + ",\n".join(rows)
    + "\n  )\n}\n"
)
open(OUT, "w").write(src)
print(f"wrote {OUT}: {len(cents)} centroids")
