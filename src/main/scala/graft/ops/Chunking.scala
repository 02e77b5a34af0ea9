package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pretraining corpus shaping: split long documents into overlapping
  * token chunks, and pack short documents into fixed-budget sequence
  * bins.
  *
  * Both are pure-relational formulations of steps usually written as
  * driver-side loops:
  *  - chunking is a per-row `transform` + `explode` — map-only, no
  *    shuffle, chunk boundaries derived from the token array itself;
  *  - packing uses a running token-count window → bin id =
  *    ⌊cumsum / budget⌋ — one shuffle (the window sort), deterministic
  *    given the ordering key, and each bin's fill never exceeds budget +
  *    one document (the classic streaming next-fit guarantee).
  */
object Chunking {

  /** Explode a document into overlapping chunks of `chunkTokens` tokens
    * with `overlap` tokens carried between consecutive chunks. The final
    * partial chunk is kept (training pipelines usually pad it).
    *
    * Output: one row per chunk with `chunk_idx`, `chunk_text`,
    * `chunk_n_tokens`.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap/$chunkTokens")
    val stride = chunkTokens - overlap
    val toks = TextAnalysis.tokens(col(textCol))
    // chunk starts: 0, stride, 2·stride, … — but only while the chunk adds
    // tokens not already covered by its predecessor. Chunk i contributes new
    // tokens iff chunk i−1 ends before the document does, i.e.
    // (i−1)·stride + chunkTokens < n ⟺ i·stride < n − overlap, so
    // nChunks = ⌈(n − overlap) / stride⌉ (floored at 1 for short docs).
    // The naive ⌈n / stride⌉ emits a final chunk lying entirely inside the
    // previous one whenever the last stride-grid start lands within
    // `overlap` of the end — duplicated training text.
    val nChunks = greatest(
      ceil((size(toks) - overlap).cast("double") / stride).cast("int"), lit(1))
    val chunks = transform(sequence(lit(0), nChunks - 1), i => struct(
      i.as("chunk_idx"),
      concat_ws(" ", slice(toks, i * stride + lit(1), lit(chunkTokens)))
        .as("chunk_text"),
      least(size(toks) - i * stride, lit(chunkTokens)).as("chunk_n_tokens")))
    df.select(col(idCol), explode(chunks).as("c"))
      .select(col(idCol), col("c.chunk_idx"), col("c.chunk_text"),
        col("c.chunk_n_tokens"))
      .filter(col("chunk_n_tokens") > 0)
  }

  /** Pack documents into sequence bins of at most ~`budgetTokens`:
    * documents are ordered by `orderCol` (deterministic), a running token
    * total is computed, and bin id = ⌊(cumsum − n) / budget⌋ — the
    * next-fit packing where a document opens a new bin if it does not
    * fully fit. Output: one row per document with its `bin` and the
    * document's token count.
    *
    * Single global window: fine when packing happens within a partition
    * key (pass groupCols); the degenerate global case sorts on one
    * reducer and is test-scale only — at 100 TB pack within
    * (source, date) style groups, which is also what keeps bins
    * homogeneous.
    */
  def pack(df: DataFrame, idCol: String, textCol: String,
      budgetTokens: Long, groupCols: Seq[String] = Nil): DataFrame = {
    val n = size(TextAnalysis.tokens(col(textCol))).cast("long")
    val w0 = if (groupCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(groupCols.map(col): _*)
    val w = w0.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val withN = df.select(
      (groupCols.map(col) :+ col(idCol) :+ n.as("n_tokens")): _*)
    withN
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("bin",
        floor((col("__cum") - col("n_tokens")) / budgetTokens).cast("long"))
      .drop("__cum")
  }
}
