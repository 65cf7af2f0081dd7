package graft.llm

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("curate: quality filter, exact dedup, and near-dup drop compose") {
    // 42-token doc passing every gopher rule (40 distinct 3-letter words
    // + 2 stopwords), duplicated exactly and near-duplicated
    val good = ((0 until 40).map(i => s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}x")
      ++ Seq("the", "and")).mkString(" ")
    val near = good.replace("aax", "qqq") // 1 of 40 shingle-words changed
    val docs = Seq(
      (0L, good),            // survives
      (1L, good),            // exact dup of 0 -> dropped
      (2L, near),            // near dup of 0 (jaccard > 0.8) -> dropped
      (3L, "tiny doc here")  // fails the word-count rule
    ).toDF("doc_id", "text")
    val r = Curation.curate(docs).as[Long].collect().toSeq
    assert(r == Seq(0L))
  }
}
