#!/usr/bin/env python3
"""Regenerate src/main/scala/graft/llm/PqCodebook.scala.

Trains per-subspace product-quantization codebooks for q64_knn_ivfpq:
the 64-dim embedding splits into M=8 contiguous 8-dim subspaces; each
gets K=16 Lloyd k-means centroids (init = first 16 subvectors, 20
iterations) over the sf0.01 embeddings. Values round to 6 decimals so
the frozen literals parse to identical doubles in Spark and DuckDB.
Driver-side tooling only (duckdb/numpy are not Scala dependencies).
"""
import duckdb
import numpy as np

M, SUB, K, ITERS = 8, 8, 16, 20
SRC = "/root/testdata/sf0.01/embeddings.parquet"
OUT = "/root/repo/src/main/scala/graft/llm/PqCodebook.scala"

con = duckdb.connect()
df = con.sql(f"select vec_id, embedding from '{SRC}' order by vec_id").df()
E = np.array([np.array(e, dtype=np.float64) for e in df.embedding])

books = []
for m in range(M):
    S = E[:, m * SUB:(m + 1) * SUB]
    cents = S[:K].copy()
    for _ in range(ITERS):
        d2 = ((S[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        for c in range(K):
            sel = S[a == c]
            if len(sel):
                cents[c] = sel.mean(0)
    books.append(np.round(cents, 6))

book_rows = []
for m, book in enumerate(books):
    cent_rows = ",\n".join(
        "      Array(" + ", ".join(repr(float(x)) for x in c) + ")"
        for c in book)
    book_rows.append(f"    Array(\n{cent_rows}\n    )")

src = (
    "package graft.llm\n\n"
    "/** Product-quantization codebooks: M=8 contiguous 8-dim subspaces x\n"
    "  * K=16 Lloyd k-means centroids each (init = first 16 subvectors of\n"
    "  * sf0.01 embeddings, 20 iterations, rounded to 6 decimals) frozen to\n"
    "  * literals so encoding is deterministic and the DuckDB oracle sees\n"
    "  * bit-identical centroids. Regenerate with\n"
    "  * scripts/train_pq_codebook.py if the testdata changes.\n"
    "  */\n"
    "object PqCodebook {\n"
    f"  val M = {M}\n"
    f"  val SubDim = {SUB}\n"
    f"  val K = {K}\n"
    "  /** books(m)(k) = centroid k of subspace m (8 doubles). */\n"
    "  val books: Array[Array[Array[Double]]] = Array(\n"
    + ",\n".join(book_rows)
    + "\n  )\n}\n"
)
open(OUT, "w").write(src)
print(f"wrote {OUT}: {M} subspaces x {K} centroids")
