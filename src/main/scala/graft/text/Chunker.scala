package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.MinHashLSH

/** Document chunking for training-data preparation: fixed-size token windows
  * with overlap (stride < size), the standard pre-tokenization segmentation
  * for long documents.
  *
  * Pure narrow transformation: tokenize → window starts via `sequence` →
  * `slice`/`concat_ws` per start → explode. No shuffle; output rows carry
  * (id, chunk_start, chunk text, token count) so downstream token accounting
  * and dedup can run per chunk.
  */
object Chunker {

  /** One row per chunk. `size` tokens per chunk, windows starting every
    * `stride` tokens (1-based starts: 1, 1+stride, ...). The last chunk may
    * be short; empty docs yield one empty chunk (start=1), keeping every
    * doc represented.
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size, "need 0 < stride <= size")
    val w = MinHashLSH.tokensCol(col(textCol))
    df.select(col(idCol), w.as("__w"))
      .select(col(idCol),
        explode(transform(
          sequence(lit(1), greatest(size_(col("__w")), lit(1)), lit(stride)),
          i => struct(i.as("chunk_start"),
            concat_ws(" ", slice(col("__w"), i, lit(size))).as("chunk_text"),
            least(size_(col("__w")) - i + 1, lit(size)).as("n_tokens")))).as("__c"))
      .select(col(idCol), col("__c.chunk_start"), col("__c.chunk_text"), col("__c.n_tokens"))
  }

  /** Sequence packing: assign each doc's chunks (in `orderCol` order) to
    * fixed-token-budget training sequences — a chunk lands in the sequence
    * indexed by `precedingTokens DIV budget`, so sequences fill contiguously
    * and a doc never interleaves with another. One window per (doc,
    * position): a single shuffle on the doc key, no cross-doc state —
    * embarrassingly parallel at corpus scale.
    */
  def packSequences(chunks: DataFrame, docCol: String, orderCol: String,
      tokensCol: String, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(docCol)).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    chunks
      .withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("seq_id",
        ((col("__cum") - col(tokensCol)) / budget).cast("int")) // nonneg: trunc == floor == DIV
      .drop("__cum")
  }

  private def size_(c: org.apache.spark.sql.Column) = org.apache.spark.sql.functions.size(c)
}
