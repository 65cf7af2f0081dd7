package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-token-budget training shards.
  *
  * This is CONTIGUOUS packing — documents are taken in deterministic
  * `doc_id` order within each `partCol` group and a shard boundary falls
  * wherever the running token total crosses the budget (shard id =
  * exclusive-prefix-sum div budget). Shards can overflow by at most one
  * document, the standard approximation; true bin-packing is NP-hard and
  * order-destroying, and contiguous packing is what a deterministic,
  * resumable pipeline wants (membership is a pure function of the sorted
  * prefix, so a backfill reproduces identical shards).
  *
  * Scale: the running sum is a window per `partCol` group — work
  * parallelizes across groups (sources, date buckets, …) and NO global
  * single-partition window exists. Token counts ride the window, text does
  * not. */
object Packing {

  def packDocs(docs: DataFrame, budgetTokens: Long = 512,
               partCol: String = "source", textCol: String = "text"): DataFrame = {
    require(budgetTokens >= 1, "budgetTokens must be >= 1")
    val w = Window.partitionBy(col("part")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"), col(partCol).as("part"),
        size(TextAnalysis.tokens(col(textCol))).cast("bigint").as("n_tokens"))
      .withColumn("cum_excl", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("part"), col("n_tokens"),
        expr(s"cum_excl div $budgetTokens").as("shard"))
      .orderBy("doc_id")
  }
}
