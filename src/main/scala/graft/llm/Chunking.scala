package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document → training-sequence chunking: the pass that turns a cleaned
  * corpus into fixed-length token windows for LLM pre-training.
  *
  * Shape at 100 TB: map-only — one tokenize per document, then an
  * `explode` over the (small) chunk-start index range. No shuffle, no
  * window, no state; chunk rows are emitted inside the same scan stage,
  * so this runs at scan speed and parallelizes with the input splits.
  * Overlap (stride < chunkSize) multiplies output size by
  * chunkSize/stride — an intentional, bounded blow-up.
  */
object Chunking {

  /** Split `textCol` into overlapping token windows.
    *
    * Chunk i covers tokens `[i*stride, min(i*stride + chunkSize, n))`
    * (0-based); a chunk exists for every start < n, so the final chunk
    * may be shorter than `chunkSize` but no token is ever dropped.
    * Tokenization is single-space split (the corpus format — swap the
    * tokenizer expression for a real pre-tokenizer as needed).
    *
    * Output: `idCols ++ (chunk_id, chunk_text, n_chunk_tokens)`.
    */
  def chunkByTokens(df: DataFrame, idCols: Seq[String], textCol: String,
                    chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride")
    for (c <- Seq("toks", "chunk", "chunk_id", "chunk_text", "n_chunk_tokens"))
      require(!df.columns.contains(c),
        s"input frame already carries the reserved column $c")
    val n = size(col("toks"))
    // integer DIV, not an int cast of double division: a double quotient
    // can land a hair under an exact integer at extreme token counts and
    // mis-floor; n >= 1 keeps it non-negative.
    val lastChunk = expr(s"cast((size(toks) - 1) div $stride as int)")
    df.select(idCols.map(col) :+ split(col(textCol), " ").as("toks"): _*)
      .where(n >= 1)
      .select(idCols.map(col) :+ col("toks") :+
        explode(sequence(lit(0), lastChunk)).as("chunk_id"): _*)
      .select(idCols.map(col) :+ col("chunk_id").cast("long").as("chunk_id") :+
        slice(col("toks"), col("chunk_id") * stride + 1, lit(chunkSize))
          .as("chunk"): _*)
      .select(idCols.map(col) :+ col("chunk_id") :+
        array_join(col("chunk"), " ").as("chunk_text") :+
        size(col("chunk")).cast("long").as("n_chunk_tokens"): _*)
  }
}
