package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for retrieval / context-window pipelines
  * (beyond-reference, north star): split each doc into overlapping
  * token windows — the preprocessing step for embedding indexes (pair
  * with [[Similarity]]) and for fixed-context training data (pair with
  * the packing op).
  *
  * Scale: one projection + one explode per doc — no shuffle at all;
  * chunk ids are deterministic (doc id + 0-based chunk index), so the
  * output is stable under any partitioning and re-run.
  */
object Chunker {

  /** Overlapping token-window chunks: (id, chunk_idx, chunk_text,
    * n_tokens). Chunk k covers tokens [1 + k·stride, 1 + k·stride +
    * chunkSize − 1] (1-based, clipped at the doc end) with
    * stride = chunkSize − overlap; starts run while ≤ token count, so
    * every token lands in at least one chunk and consecutive chunks
    * share exactly `overlap` tokens (the final chunk may be shorter).
    */
  def chunkTokens(docs: DataFrame, chunkSize: Int, overlap: Int = 0,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need chunkSize > 0 and 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    docs
      // null or whitespace-only docs have no tokens → zero chunks.
      // (Text.tokens("") is [""], a one-element array of the empty
      // string — without this filter such docs fabricated one empty
      // chunk with a phantom n_tokens=1 that downstream token
      // accounting would count. The DuckDB oracle applies the same
      // predicate.)
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("__toks"))
      .select(col("id"), col("__toks"),
        posexplode(sequence(lit(1), greatest(size(col("__toks")), lit(1)),
          lit(stride))).as(Seq("chunk_idx", "start")))
      .select(col("id"), col("chunk_idx").cast("int").as("chunk_idx"),
        concat_ws(" ", slice(col("__toks"), col("start"), lit(chunkSize))).as("chunk_text"),
        least(lit(chunkSize), size(col("__toks")) - col("start") + 1)
          .cast("int").as("n_tokens"))
  }
}
