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

  /** Length-bucket padding audit: docs bucket to the next power-of-two
    * token length (floor `minBucket`), reporting per bucket the doc count,
    * real token mass, padded mass (`n_docs × bucket`), and the padding
    * fraction wasted if batches pad to the bucket size — the number that
    * decides between plain padding and sequence packing at training time.
    *
    * The power-of-two is integer-exact via the bit width of `n−1`
    * (`shiftleft(1, length(bin(n-1)))`) — no float `log2` edge cases at
    * exact powers. One map-only pass + a tiny bucket-keyed hash-agg. */
  def lengthBuckets(docs: DataFrame, minBucket: Int = 16,
                    textCol: String = "text"): DataFrame = {
    require(minBucket >= 2 && (minBucket & (minBucket - 1)) == 0,
      "minBucket must be a power of two >= 2")
    val n = size(TextAnalysis.tokens(col(textCol))).cast("long")
    val n1 = greatest(n, lit(1L))
    // functions.shiftleft only takes a literal shift; call the SQL builtin
    val bucket = greatest(lit(minBucket.toLong),
      call_function("shiftleft", lit(1L), length(bin(n1 - 1)).cast("int")))
    docs.select(bucket.as("bucket"), n.as("n_tokens"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .select(col("bucket"), col("n_docs"), col("sum_tokens"),
        (col("n_docs") * col("bucket")).as("padded_tokens"),
        (lit(1.0) - col("sum_tokens").cast("double")
          / (col("n_docs") * col("bucket")).cast("double")).as("padding_frac"))
      .orderBy("bucket")
  }
}
