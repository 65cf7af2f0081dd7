package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity pins for the r16 codegen text hot-path expressions: the byte-scan
  * tokenizer and the byte-slice shingle hasher must be VALUE-identical to
  * the expression trees they replaced (the oracle contract of every
  * consumer rides on this). */
class TokenShingleParitySpec extends SparkSpec {
  import spark.implicits._

  /** Adversarial corpus: ASCII, separators-only, empty, null, multibyte
    * UTF-8, and the nasty lowercase mappings — U+212A (KELVIN SIGN)
    * lowercases INTO 'k', U+0130 (İ) lowercases to "i" + combining dot,
    * ß stays ß, plus surrogate-pair emoji. */
  private val alphabet: Array[String] =
    ("abcdefghijklmnopqrstuvwxyz".map(_.toString) ++
      "AZMQ".map(_.toString) ++ Seq(" ", "  ", ".", ",", "0", "9", "-", "_",
      "K", "İ", "ß", "é", "Ж", "中", "😀", "\t", "\n")).toArray

  private def randomTexts(n: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val len = rnd.nextInt(120)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } ++ Seq("", "   ", "...9...", "KKelvin runs", "İstanbul İİ",
      "a", "z ", " q", null)
  }

  private val regexToks =
    (c: org.apache.spark.sql.Column) => filter(split(lower(c), "[^a-z]+"), t => t =!= lit(""))

  test("ascii_tokens ≡ filter(split(lower(text), \"[^a-z]+\"), _ != \"\") " +
    "on adversarial unicode (incl. non-ASCII chars that lowercase into a-z)") {
    val df = randomTexts(600, 20260818L).toDF("text")
    val mismatches = df.select(
        functions.ascii_tokens(col("text")).as("a"),
        regexToks(col("text")).as("b"), col("text"))
      .where(!(col("a") <=> col("b")))
      .collect()
    assert(mismatches.isEmpty,
      s"token stream diverged on: ${mismatches.take(5).mkString("; ")}")
  }

  test("ascii_tokens: interpreted eval matches codegen (fallback parity)") {
    val texts = randomTexts(100, 7L)
    val viaEval = texts.map { t =>
      if (t == null) null
      else {
        val r = AsciiTok.tokens(org.apache.spark.unsafe.types.UTF8String.fromString(t))
        (0 until r.numElements()).map(i => r.getUTF8String(i).toString)
      }
    }
    val viaDf = texts.toDF("text")
      .select(regexToks(col("text")).as("b")).as[Seq[String]].collect().toSeq
    assert(viaEval == viaDf)
  }

  test("shingle_window_hashes (stride 1, full windows) ≡ " +
    "xxhash64(array_join(slice(toks, i, w), \" \")) for w = 2, 3, 8, 10") {
    val df = randomTexts(400, 99L).toDF("text")
      .select(functions.ascii_tokens(col("text")).as("toks"))
      .where(col("toks").isNotNull)
    for (w <- Seq(2, 3, 8, 10)) {
      val old = transform(sequence(lit(1), greatest(size(col("toks")) - lit(w - 1), lit(0))),
        i => xxhash64(array_join(slice(col("toks"), i, lit(w)), " ")))
      val bad = df.where(size(col("toks")) >= w)
        .select(functions.shingle_window_hashes(col("toks"), w).as("a"), old.as("b"))
        .where(!(col("a") <=> col("b"))).count()
      assert(bad == 0L, s"w=$w window hashes diverged")
    }
  }

  test("shingle_window_hashes (stride k, partial tail) ≡ " +
    "xxhash64(concat_ws(\" \", slice(toks, st, k))) over sequence(1, n, k)") {
    val df = randomTexts(400, 4242L).toDF("text")
      .select(functions.ascii_tokens(col("text")).as("toks"))
      .where(col("toks").isNotNull && size(col("toks")) >= 1)
    for (k <- Seq(1, 3, 10)) {
      val old = transform(sequence(lit(1), size(col("toks")), lit(k)),
        st => xxhash64(concat_ws(" ", slice(col("toks"), st, lit(k)))))
      val bad = df.select(
          functions.shingle_window_hashes(col("toks"), k, stride = k,
            fullOnly = false).as("a"), old.as("b"))
        .where(!(col("a") <=> col("b"))).count()
      assert(bad == 0L, s"k=$k span hashes diverged")
    }
  }

  test("shingle_window_hashes: null ELEMENTS take the concat_ws null-skip " +
    "path (no separator for the skipped slot)") {
    val df = Seq(1).toDF("x").select(
      array(lit("aa"), lit(null).cast("string"), lit("bb"), lit("cc")).as("toks"))
    val viaNew = df.select(functions.shingle_window_hashes(col("toks"), 3))
      .as[Seq[Long]].head()
    val viaOld = df.select(transform(sequence(lit(1), lit(2)),
        i => xxhash64(concat_ws(" ", slice(col("toks"), i, lit(3))))))
      .as[Seq[Long]].head()
    assert(viaNew == viaOld)
  }
}
