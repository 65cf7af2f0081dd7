package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composed pipeline a training-data run
  * actually executes, wired from the per-stage operators so each stage keeps
  * its own scale shape (map-only filter → slim-shuffle exact dedup →
  * bucketed near-dup drop).
  */
object Curation {

  /** Gopher rule filter → exact dedup (min doc_id survives) → n-gram Jaccard
    * near-dup drop (pair's larger id drops). Returns the surviving doc_ids.
    *
    * Stage shapes (all inherited, all plan-asserted in their own specs):
    * the quality filter is one codegen stage over the scan
    * ([[TextAnalysis.gopherFilter]]); the id set it passes is slim, so the
    * semi-join back is broadcast-friendly; exact dedup shuffles (hash, id)
    * only ([[Dedup.dropExactDups]]); the near-dup stage is the exact
    * verifier tier here — swap in [[Dedup.minHashNearDup]] (same pair
    * contract) for the 100 TB run, as [[Dedup.cleanCorpusMinHash]] does. */
  def curate(docs: DataFrame, threshold: Double = 0.8, w: Int = 3): DataFrame = {
    val passed = TextAnalysis.gopherFilter(docs)
      .where(col("gopher_pass")).select("doc_id")
    val kept = docs.join(passed, Seq("doc_id"), "left_semi")
    val exact = Dedup.dropExactDups(kept)
    val dropped = Dedup.ngramJaccardPairs(exact, threshold, w)
      .select(col("id_b").as("doc_id")).distinct()
    exact.join(dropped, Seq("doc_id"), "left_anti")
      .select("doc_id").orderBy("doc_id")
  }
}
