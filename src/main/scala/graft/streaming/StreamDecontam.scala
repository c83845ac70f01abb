package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming train/eval decontamination: batch q76's stream twin,
  * completing the streaming curation family (exact dedup, MinHash and
  * embedding near-dup, quality gate, and now benchmark hygiene).
  *
  * The benchmark suite is a STATIC table (megabytes against an
  * unbounded training stream), so contamination checking is a
  * stream-static inner equi-join on 8-byte shingle hashes with the
  * eval side broadcast — stateless except for the per-doc
  * first-emission dedup, so it scales with partition count and never
  * shuffles the stream's shingles.
  */
object StreamDecontam {

  /** 8-byte hashes of the word-`n`-gram shingles of a `text` column —
    * identical semantics to `Dedup.shingles` but as a pure column
    * pipeline usable on a streaming frame (explode of the positional
    * transform; docs with < n tokens produce no rows). */
  def shingleHashes(docs: DataFrame, n: Int): DataFrame =
    docs
      .withColumn("w", split(trim(col("text")), "\\s+"))
      .withColumn("s", explode(expr(
        s"transform(slice(w, 1, greatest(size(w) - ${n - 1}, 0)), " +
          s"(x, i) -> concat_ws(' ', slice(w, i + 1, $n)))")))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))

  /** Contaminated doc ids from a streaming `docs(doc_id, text)` frame:
    * any doc sharing a word-8-gram with `evalDocs(doc_id, text)`
    * (static). Emits each contaminated doc once (append mode). */
  def contaminated(docs: DataFrame, evalDocs: DataFrame): DataFrame = {
    val ev = shingleHashes(evalDocs, 8)
      .select(col("h"), col("doc_id").as("eval_doc")).distinct()
    shingleHashes(docs, 8)
      .join(broadcast(ev), "h")
      .select(col("doc_id"), col("eval_doc"))
      .dropDuplicates("doc_id")
  }
}
