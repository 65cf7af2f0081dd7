package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "The quick brown fox and the lazy dog", "en", "s1", 37L),
    (1L, "the the the spark spark engine", "en", "s1", 30L),
    (2L, "der hund und die katze und der vogel", "de", "s2", 37L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("tokens lowercases and splits on non-alpha runs") {
    val t = Seq(Tuple1("Héllo, WORLD!! 42 foo_bar")).toDF("text")
      .select(TextAnalysis.tokens(col("text"))).as[Seq[String]].collect()(0)
    assert(t == Seq("h", "llo", "world", "foo", "bar")) // non-[a-z] splits, digits drop
  }

  test("topTokens counts with multiplicity, ties broken by token asc") {
    val top = TextAnalysis.topTokens(docs, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top.head == (("the", 5L))) // 2 (doc0, lowercased "The"+"the") + 3 (doc1)
    assert(top(1) == (("der", 2L))) // count-2 tie (der/spark/und) broken by token asc
  }

  test("heavyHitters: exact counts, shares, and the 1/support output bound") {
    // 22 tokens total; support 0.1 → threshold 2.2 occurrences, only "the"
    // (5) clears it ("der"/"und"/"spark" sit at 2)
    val hh = TextAnalysis.heavyHitters(docs, support = 0.1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(hh.map(t => (t._1, t._2)) == Seq(("the", 5L)))
    assert(hh.head._3 == 5.0 / 22.0) // one IEEE division of exact integers
    val lower = TextAnalysis.heavyHitters(docs, support = 0.05).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(lower == Seq(("the", 5L), ("der", 2L), ("spark", 2L), ("und", 2L)))
    assert(hh.size <= (1.0 / 0.1).toInt) // ≤ 1/support rows by construction
  }

  test("frequentItemsApprox is a superset of the exact heavy hitters (sketch guarantee)") {
    for (support <- Seq(0.05, 0.1, 0.3)) {
      val exact = TextAnalysis.heavyHitters(docs, support).select("token")
        .as[String].collect().toSet
      val approx = TextAnalysis.frequentItemsApprox(docs, support)
        .as[String].collect().toSet
      assert(exact.subsetOf(approx),
        s"support=$support: sketch missed ${exact -- approx} (false negatives are forbidden)")
    }
  }

  test("textStats aggregates per lang with exact mean") {
    val r = TextAnalysis.textStats(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(r == Seq(("de", 1L, 37.0, 1L), ("en", 2L, 33.5, 1L)))
  }

  test("tokenCounts: whitespace vs distinct vs bpe-ish") {
    val r = TextAnalysis.tokenCounts(Seq((0L, "ab ab cd42 cd")).toDF("doc_id", "text"))
      .collect()(0)
    assert(r.getLong(1) == 4L) // ab ab cd cd
    assert(r.getLong(2) == 2L) // ab cd
    assert(r.getLong(3) == 5L) // ab ab cd 42 cd
  }

  test("qualityScore: healthy doc scores 1.0, degenerate doc lower") {
    val r = TextAnalysis.qualityScore(Seq(
      (0L, "the quick brown fox jumps over a lazy dog today"),
      (1L, "zz")).toDF("doc_id", "text"))
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    assert(r(0L) == 1.0)
    assert(r(1L) < 0.5)
  }

  test("langId picks the language with most marker hits; und when none") {
    val r = TextAnalysis.langId(docs.unionByName(
        Seq((3L, "xyz qrs tuv", "??", "s3", 11L)).toDF("doc_id", "text", "lang", "source", "n_chars")))
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(r(0L) == "en")
    assert(r(2L) == "de")
    assert(r(3L) == "und")
  }

  test("empty and punctuation-only docs degrade gracefully across operators") {
    val edge = Seq((0L, ""), (1L, "!!! ??? 123"), (2L, "ok text here")).toDF("doc_id", "text")
    val tc = TextAnalysis.tokenCounts(edge).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(tc.take(2) == Seq((0L, 0L), (1L, 0L))) // zero tokens, no NaN/negatives
    val lid = TextAnalysis.langId(edge).collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(lid(0)._2 == "und" && lid(1)._2 == "und")
    val qs = TextAnalysis.qualityScore(edge).collect()
      .map(r => (r.getLong(0), r.getDouble(6))).toMap
    assert(qs(0L) == 0.0) // empty doc: no band passes
    val fp = TextAnalysis.fingerprint(edge).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fp(0L) == 0L && fp(1L) == 0L) // empty token stream -> fold seed
  }

  test("chunkDocs windows the token stream with overlap; tail reaches the last token") {
    // 12 tokens, chunk 5, overlap 2 -> stride 3, starts 1,4,7,10
    val letters = ('a' to 'l').map(c => s"$c$c").mkString(" ")
    val d = Seq((0L, letters), (1L, "one two"), (2L, "")).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocs(d, chunkTokens = 5, overlap = 2)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSeq
    assert(chunks.filter(_._1 == 0L).map(_._2) == Seq(0, 1, 2, 3))
    assert(chunks.head._3 == "aa bb cc dd ee")
    assert(chunks(3) == ((0L, 3, "jj kk ll", 3L))) // short tail, reaches token 12
    assert(chunks.filter(_._1 == 1L) == Seq((1L, 0, "one two", 2L))) // doc shorter than a chunk
    assert(!chunks.exists(_._1 == 2L)) // empty doc: no chunks
  }

  test("scrubText redacts emails and urls and counts hits") {
    val d = Seq(
      (0L, "mail me at jo.doe+x@foo-bar.example.com or visit https://x.example/path?q=1 now"),
      (1L, "no pii here")).toDF("doc_id", "text")
    val r = TextAnalysis.scrubText(d).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3))).toSeq
    assert(r(0) == ((0L, 1L, 1L, "mail me at <EMAIL> or visit <URL> now")))
    assert(r(1) == ((1L, 0L, 0L, "no pii here")))
  }

  test("repetition computes top/dup bigram fractions from hand-counted n-grams") {
    // doc 10: bigrams of "a b a b a b c" = [ab, ba, ab, ba, ab, bc] -> 6 total,
    // top "ab"=3 (3/6), dup = ab(3)+ba(2) = 5/6
    val d = Seq((10L, "a b a b a b c"), (11L, "x y z"), (12L, "solo")).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(d, n = 2).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getDouble(3))).toSeq
    assert(r(0) == ((10L, 6L, 3.0 / 6.0, 5.0 / 6.0)))
    assert(r(1) == ((11L, 2L, 1.0 / 2.0, 0.0))) // all bigrams unique
    assert(r.map(_._1) == Seq(10L, 11L)) // 1-token doc has no bigrams -> absent
  }

  test("topNgrams ranks bigrams by count then lexicographically") {
    val d = Seq((0L, "a b a b c"), (1L, "a b z z")).toDF("doc_id", "text")
    val top = TextAnalysis.topNgrams(d, n = 2, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L))) // count-1 ties: lexicographic
  }

  test("tokenNgrams guards short docs (no fabricated windows from a descending sequence)") {
    val d = Seq((0L, "one two")).toDF("doc_id", "text")
    val g = d.select(TextAnalysis.tokenNgrams(TextAnalysis.tokens(col("text")), 3))
      .as[Seq[String]].collect()(0)
    assert(g.isEmpty)
  }

  test("tfidfTopTerms: hand-computed scores, ties to token asc, exchange reused") {
    val docs = Seq((1L, "apple banana apple"), (2L, "banana cherry")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, k = 2)
    // collect from `out` itself so ITS queryExecution materializes (AQE
    // exchange reuse only shows in an executed plan)
    val r = out.collect().toSeq
      .map(row => (row.getLong(0), row.getInt(1), row.getString(2), row.getDouble(3)))
    val ln2 = math.log(2.0)
    assert(r.map(t => (t._1, t._2, t._3)) ==
      Seq((1L, 1, "apple"), (1L, 2, "banana"), (2L, 1, "cherry"), (2L, 2, "banana")))
    assert(math.abs(r(0)._4 - 2.0 / 3 * ln2) < 1e-6) // apple in d1
    assert(r(1)._4 == 0.0)                           // banana: df = all docs
    assert(math.abs(r(2)._4 - 0.5 * ln2) < 1e-6)     // cherry in d2
    // single-scan invariant: doc frequency and doc totals are windows over
    // the one tf aggregate, so the corpus explodes exactly once
    // AdaptiveSparkPlan prints "== Final Plan ==" then "== Initial Plan ==";
    // only the final section is what actually ran
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val generates = plan.linesIterator.count(_.contains("Generate explode"))
    assert(generates == 1, s"expected 1 explode, saw $generates:\n$plan")
  }

  test("normalizeText collapses whitespace, trims, lowercases") {
    val r = TextAnalysis.normalizeText(
        Seq((1L, " Hello\t\tWorld \n"), (2L, "ok")).toDF("doc_id", "text"))
      .select("doc_id", "norm_text", "n_chars_raw", "n_chars_norm")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(r == Seq((1L, "hello world", 15L, 11L), (2L, "ok", 2L, 2L)))
  }

  test("invertedIndex: postings, totals, and the sampleK cap") {
    val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val r = TextAnalysis.invertedIndex(docs)
      .as[(String, Long, Long, String)].collect().toSeq
    assert(r == Seq(("a", 1L, 2L, "1"), ("b", 2L, 2L, "1 2"), ("c", 1L, 1L, "2")))
    val capped = TextAnalysis.invertedIndex(docs, sampleK = 1)
      .as[(String, Long, Long, String)].collect().toSeq
    // counts still cover every doc; only the posting sample is capped
    assert(capped.find(_._1 == "b").get == (("b", 2L, 2L, "1")))
  }

  test("pmiTopBigrams: hand-computed PMI, equal scores tie on bigram") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    // U=6 (a:3 b:2 c:1), B=3 (ab:2 ac:1); PMI(ab) = ln(2*36/(3*3*2)) = ln 4,
    // PMI(ac) = ln(36/(3*3*1)) = ln 4 — identical, so order is bigram asc
    val r = TextAnalysis.pmiTopBigrams(docs, k = 10, minCount = 1)
      .as[(String, Long, Double)].collect().toSeq
    assert(r.map(_._1) == Seq("a b", "a c"))
    assert(r.forall(t => math.abs(t._3 - math.log(4.0)) < 1e-6))
    assert(r.map(_._2) == Seq(2L, 1L))
  }

  test("domainStats: URL hosts, occurrence and distinct-doc counts") {
    val docs = Seq(
      (1L, "see https://a.com/x and https://a.com/y plus http://b.org"),
      (2L, "again https://a.com/z"),
      (3L, "no urls here")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.domainStats(docs)
      .as[(String, Long, Long)].collect().toSeq
    assert(r == Seq(("a.com", 3L, 2L), ("b.org", 1L, 1L)))
  }

  test("oovRate: corpus top-k vocab coverage per doc, vocab broadcast") {
    // counts: b:3, a:2, c:1 -> top-2 vocab {b, a}; d1 has one OOV (c)
    val docs = Seq((1L, "a a b c"), (2L, "b b")).toDF("doc_id", "text")
    val out = TextAnalysis.oovRate(docs, vocabK = 2)
    val r = out.as[(Long, Long, Long, Double)].collect().toSeq
    assert(r == Seq((1L, 4L, 1L, 0.25), (2L, 2L, 0L, 0.0)))
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "vocab must broadcast — a shuffle join on token rows defeats the design")
  }

  test("fingerprint matches the hand-computed rolling hash and is order-sensitive") {
    def fp(toks: Seq[String]): Long =
      toks.foldLeft(0L)((acc, tk) => (acc * 131L + 31L * tk.length + tk.head.toInt) % 1000000007L)
    val r = TextAnalysis.fingerprint(Seq(
      (0L, "alpha beta gamma"), (1L, "beta alpha gamma")).toDF("doc_id", "text"))
      .select("doc_id", "fingerprint").as[(Long, Long)].collect().toMap
    assert(r(0L) == fp(Seq("alpha", "beta", "gamma")))
    assert(r(1L) == fp(Seq("beta", "alpha", "gamma")))
    assert(r(0L) != r(1L))
  }
  test("gopherFilter: each rule flags independently and the verdict conjoins") {
    // 40 distinct 3-letter words + 2 stopwords: 42 tokens, distinct ratio 1,
    // mean word length exactly 3.0 (the inclusive lower edge)
    val good = ((0 until 40).map(i => s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}x")
      ++ Seq("the", "and")).mkString(" ")
    val docs = Seq(
      (0L, good),                               // passes everything
      (1L, "tiny doc of words"),                // fails word count
      (2L, (Seq.fill(60)("zzzz")).mkString(" ")) // enough tokens, no stopwords, low distinct ratio
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherFilter(docs)
      .select("doc_id", "pass_word_count", "pass_stopwords", "pass_distinct_ratio", "gopher_pass")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect().toSeq
    assert(r(0) == ((0L, true, true, true, true)))
    assert(r(1)._2 == false && r(1)._5 == false)
    assert(r(2)._2 == true && r(2)._3 == false && r(2)._4 == false && r(2)._5 == false)
  }

  test("bigramLmScore: hand-computed add-one smoothed scores") {
    val docs = Seq((0L, "a b a b"), (1L, "a b"), (2L, "c")).toDF("doc_id", "text")
    val r = TextAnalysis.bigramLmScore(docs).collect()
    // unigrams: a=3 b=3 c=1, V=3; corpus bigrams: "a b"=3, "b a"=1
    val tAB = math.rint(math.log(4.0 / 6.0) * 1e9) / 1e9
    val tBA = math.rint(math.log(2.0 / 6.0) * 1e9) / 1e9
    val d0 = r.find(_.getLong(0) == 0L).get
    assert(d0.getLong(1) == 3L)
    assert(math.abs(d0.getDouble(2) - (2 * tAB + tBA) / 3) < 1e-8)
    val d2 = r.find(_.getLong(0) == 2L).get
    assert(d2.getLong(1) == 0L && d2.isNullAt(2))
  }

  test("dsirSelect: target-distinctive tokens rank target-like docs first; " +
    "hand-computed log-ratio; deterministic under repartition") {
    import org.apache.spark.sql.functions.col
    // proposal pool: 4 "good"-vocab docs (the target slice) + 4 "spam"-vocab
    // docs; DSIR must score good-vocab docs above spam-vocab ones because
    // the target distribution concentrates on the good tokens
    val docs = Seq(
      (0L, "alpha beta alpha", "t"), (1L, "beta alpha beta", "t"),
      (2L, "alpha alpha beta", "t"), (3L, "beta beta alpha", "t"),
      (4L, "spam junk spam", "x"), (5L, "junk spam junk", "x"),
      (6L, "spam spam junk", "x"), (7L, "junk junk spam", "x")
    ).toDF("doc_id", "text", "grp")
    val r = TextAnalysis.dsirSelect(docs, isTarget = col("grp") === "t",
        k = 4, maxVocab = 10)
      .select("rnk", "doc_id", "dsir_score", "n_vocab_tokens")
      .as[(Int, Long, Double, Long)].collect().toSeq
    assert(r.map(_._2).toSet == Set(0L, 1L, 2L, 3L),
      s"selection not enriched in target-like docs: $r")
    // hand check: vocab = {alpha=6, beta=6, junk=6, spam=6}, V=4, Tp=24,
    // Tt=12 (targets hold all alpha/beta); ct: alpha=6 beta=6 junk=0 spam=0
    // engine semantics: each term rounds to 9 dp, sums EXACTLY as decimal —
    // so the expected score is 3x the 9-dp decimal, not a double multiply
    val t9 = BigDecimal(math.log(7.0 / 16.0) - math.log(7.0 / 28.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val expected = (t9 * 3).toDouble
    assert(r.head == ((1, 0L, expected, 3L)), s"head ${r.head} != $expected")
    assert(r.forall(_._4 == 3L))
    // bit-deterministic across partitionings (the oracle contract)
    val again = TextAnalysis.dsirSelect(docs.repartition(5),
        isTarget = col("grp") === "t", k = 4, maxVocab = 10)
      .select("rnk", "doc_id", "dsir_score", "n_vocab_tokens")
      .as[(Int, Long, Double, Long)].collect().toSeq
    assert(again == r)
  }

  test("dsirSelectHashed: agrees with the vocab face on separable corpora; " +
    "deterministic under repartition; collisions only blur, never invert, " +
    "a fully separated vocabulary") {
    import org.apache.spark.sql.functions.col
    // same separable fixture family as the vocab-face test: target docs
    // use only alpha/beta, proposal spam uses only spam/junk — every
    // feature (unigram or bigram) is unambiguously target- or spam-side,
    // so ANY collision-tolerant hashed estimator must rank the four
    // target-vocab docs first, exactly as the explicit-vocab face does
    val docs = Seq(
      (0L, "alpha beta alpha", "t"), (1L, "beta alpha beta", "t"),
      (2L, "alpha alpha beta", "t"), (3L, "beta beta alpha", "t"),
      (4L, "spam junk spam", "x"), (5L, "junk spam junk", "x"),
      (6L, "spam spam junk", "x"), (7L, "junk junk spam", "x")
    ).toDF("doc_id", "text", "grp")
    val vocabTop = TextAnalysis.dsirSelect(docs, isTarget = col("grp") === "t",
        k = 4, maxVocab = 10)
      .select("doc_id").as[Long].collect().toSet
    val hashed = TextAnalysis.dsirSelectHashed(docs,
        isTarget = col("grp") === "t", k = 8, nBuckets = 1 << 14)
      .select("rnk", "doc_id", "dsir_score", "n_vocab_tokens")
      .as[(Int, Long, Double, Long)].collect().toSeq
    assert(hashed.length == 8)
    // the top 4 hashed picks are exactly the vocab face's selection
    assert(hashed.take(4).map(_._2).toSet == vocabTop,
      s"hashed face top-4 diverged from vocab face on a separable corpus: $hashed")
    // every target doc outscores every proposal-only doc
    val (tgt, rest) = hashed.partition(r => r._2 <= 3L)
    assert(tgt.map(_._3).min > rest.map(_._3).max,
      s"target/spam score separation violated: $hashed")
    // unigrams + bigrams: 3 tokens -> 3 + 2 = 5 features per doc
    assert(hashed.forall(_._4 == 5L), s"feature counts: $hashed")
    // bit-deterministic across partitionings
    val again = TextAnalysis.dsirSelectHashed(docs.repartition(5),
        isTarget = col("grp") === "t", k = 8, nBuckets = 1 << 14)
      .select("rnk", "doc_id", "dsir_score", "n_vocab_tokens")
      .as[(Int, Long, Double, Long)].collect().toSeq
    assert(again == hashed)
  }

  test("bm25: Okapi scoring with Lucene idf, sorted-term fold order") {
    val docs = Seq(
      (0L, "apple banana apple"),
      (1L, "banana cherry"),
      (2L, "durian durian durian durian")
    ).toDF("doc_id", "text")
    // terms pass in unsorted; the operator sorts -> fold order apple, banana
    val r = TextAnalysis.bm25(docs, Seq("banana", "apple"), topK = 3)
      .as[(Long, Double)].collect().toMap
    // N=3, avgdl=3: identical double arithmetic to the operator
    def term(tf: Long, df: Long, dl: Long): Double = {
      val idf = math.log(1.0 + (3L - df + 0.5) / (df + 0.5))
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))
    }
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(0L) == r9(term(2, 1, 3) + term(1, 2, 3)))
    assert(r(1L) == r9(term(0, 1, 2) + term(1, 2, 2)))
    assert(r(2L) == 0.0) // no query term present
  }

  test("bpeTrain: hand-computed merge sequence, determinism, and invariants") {
    // corpus: "aaab" x2, "ab" x1 (as two docs)
    val d = Seq((0L, "aaab aaab"), (1L, "ab")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(d, numMerges = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    // round 0: pairs (a,a)=4 [two per 'aaab' x freq 2], (a,b)=3, (b,</w>)=3
    assert(m(0) == ((0, "a", "a", "aa", 4L)))
    // round 1: dict {aa a b </w>: 2, a b </w>: 1} -> (a,b)=3 ties (b,</w>)=3,
    // lexicographically smallest pair wins
    assert(m(1) == ((1, "a", "b", "ab", 3L)))
    // round 2: {aa ab </w>: 2, ab </w>: 1} -> (ab,</w>)=3 beats (aa,ab)=2
    assert(m(2) == ((2, "ab", "</w>", "ab</w>", 3L)))
    // determinism under a different partitioning
    val m2 = TextAnalysis.bpeTrain(d.repartition(3), numMerges = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(m == m2)
    // invariants on a bigger corpus: ranks consecutive, merged = left+right,
    // each merge's ingredients existed (a char, </w>, or an earlier merge)
    val big = (0L until 50L).map(i =>
      (i, s"the quick brown fox number$i jumps over the lazy dog")).toDF("doc_id", "text")
    val bm = TextAnalysis.bpeTrain(big, numMerges = 25)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(bm.map(_._1) == (0 until bm.length))
    assert(bm.forall { case (_, l, r, mg, _) => mg == l + r })
    val known = scala.collection.mutable.Set[String]("</w>")
    ('a' to 'z').foreach(c => known += c.toString)
    bm.foreach { case (_, l, r, mg, c) =>
      assert(known(l) && known(r), s"merge of unknown symbol: ($l, $r)")
      assert(c >= 1)
      known += mg
    }
    // early exhaustion: a tiny corpus runs out of pairs without erroring
    val tiny = Seq((0L, "ab")).toDF("doc_id", "text")
    val tm = TextAnalysis.bpeTrain(tiny, numMerges = 10).collect()
    assert(tm.length <= 2) // (a,b) then (ab,</w>) — then the word is one symbol
  }

  test("scoreDecilesApprox agrees with exact ntile on continuous scores") {
    import org.apache.spark.sql.expressions.Window
    // 10000 distinct scores (a permuted continuous column): value-based
    // cut-point buckets must reproduce exact ntile deciles up to sketch
    // rank error — accuracy 10000 on 10000 rows means <= 1 rank slip per
    // cut, so per-decile populations stay within a few rows of n/10
    val n = 10000
    val scored = spark.range(n)
      .select(col("id").as("doc_id"),
        (col("id") % 97).as("n_chars"),
        ((col("id") * 2654435761L) % 1000003).cast("double").as("score"))
    val approx = TextAnalysis.scoreDecilesApprox(scored, "score", "n_chars")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(approx.keySet == (1 to 10).toSet, s"missing deciles: $approx")
    approx.foreach { case (d, cnt) =>
      assert(math.abs(cnt - n / 10) <= 5, s"decile $d count $cnt far from ${n / 10}")
    }
    // per-row agreement with exact ntile except within rank-error of a cut
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    val exact = scored.withColumn("decile", ntile(10).over(w))
      .select("doc_id", "decile").as[(Long, Int)].collect().toMap
    val ps = (1 to 9).map(i => 1.0 - i.toDouble / 10)
    val cuts = scored.agg(percentile_approx(col("score"),
      typedLit(ps), lit(10000))).head().getSeq[Double](0)
    val assigned = TextAnalysis.scoreDecilesApprox(scored, "score", "n_chars")
    assert(assigned.agg(sum("n_docs")).head().getLong(0) == n)
    val perRow = scored.withColumn("d",
        cuts.zipWithIndex.reverse.foldLeft(lit(10)) { case (acc, (t, i)) =>
          when(col("score") >= lit(t), lit(i + 1)).otherwise(acc) })
      .select("doc_id", "d").as[(Long, Int)].collect().toMap
    val disagree = perRow.count { case (id, d) => d != exact(id) }
    assert(disagree <= 9 * 3, s"$disagree rows disagree with exact ntile")
  }

  test("qualityDecilesApprox: buckets partition the corpus with ordered, " +
    "disjoint score intervals; ties never split") {
    // discrete composite scores (massive ties): populations are unequal by
    // design, but the table must still partition the corpus and order its
    // intervals; every distinct score lands in exactly one bucket
    val d = (0L until 300L).map { i =>
      val text =
        if (i % 3 == 0) "the quick brown fox jumps over a lazy dog today"
        else if (i % 3 == 1) "zz"
        else "the and of to in is on for the and of to in is on for"
      (i, text)
    }.toDF("doc_id", "text")
    val out = TextAnalysis.qualityDecilesApprox(d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(out.map(_._2).sum == 300L)
    // bucket 1 holds the highest scores; intervals are disjoint and ordered
    val sorted = out.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, _, lo1, _), (_, _, _, hi2)) => assert(lo1 >= hi2)
      case _ =>
    }
    // a distinct score never appears in two buckets
    sorted.foreach { case (_, _, lo, hi) => assert(lo <= hi) }
    val scores = TextAnalysis.qualityScore(d).select("quality_score")
      .distinct().as[Double].collect()
    scores.foreach { s =>
      val holders = sorted.filter { case (_, _, lo, hi) => s >= lo && s <= hi }
      assert(holders.length == 1, s"score $s in ${holders.length} buckets")
    }
  }

  test("scoreDecilesApprox on an EMPTY scored frame returns an empty lift " +
    "table with the right schema instead of NPE-ing on NULL cuts (ADVICE r7)") {
    val empty = spark.range(0)
      .select(col("id").as("doc_id"), col("id").as("n_chars"),
        col("id").cast("double").as("score"))
    val out = TextAnalysis.scoreDecilesApprox(empty, "score", "n_chars")
    assert(out.count() == 0L)
    assert(out.columns.toSeq ==
      Seq("decile", "n_docs", "mean_chars", "min_score", "max_score"))
    // and the all-filtered path through the public tier is NPE-free too
    val docs = Seq((1L, "some text here")).toDF("doc_id", "text")
    val none = TextAnalysis.qualityDecilesApprox(docs.where(lit(false)))
    assert(none.count() == 0L)
  }

}
