package graft

import org.apache.spark.sql.functions._
import graft.ops.Tokenizer

/** Pins the BPE training trajectory on a hand-computed fixture — which
  * pair wins each round (counts, ties) and how every word re-symbolizes,
  * including the overlap case the run-parity merge rule exists for. */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  // words: aaaa×2, b×1, low×2, lower×1
  // r1 pairs: (a,a)=3·2=6 wins → aaaa = [aa, aa] (overlap: merge i=1 and i=3)
  // r2 pairs: (aa,aa)=2, (l,o)=3, (o,w)=3, (w,e)=1, (e,r)=1
  //   → tie 3/3 broken to the smaller s1: (l,o) wins → low=[lo,w], lower=[lo,w,e,r]
  // r3 pairs: (aa,aa)=2, (lo,w)=3 wins → low=[low], lower=[low,e,r]
  private val docs = Seq(
    (1L, "aaaa aaaa b"),
    (2L, "low low lower")).toDF("doc_id", "text")

  test("3-round trajectory matches the hand computation (overlaps, ties, re-merges)") {
    val got = Tokenizer.bpeTrain(docs, 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    assert(got == Map(
      "aaaa" -> ((2L, "aa aa", 2L)),
      "b" -> ((1L, "b", 1L)),
      "low" -> ((2L, "low", 1L)),
      "lower" -> ((1L, "low e r", 3L))))
  }

  test("zero rounds returns the character symbolization") {
    val got = Tokenizer.bpeTrain(docs, 0)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got("lower") == "l o w e r" && got("b") == "b")
  }

  test("training is deterministic across repeated runs") {
    val a = Tokenizer.bpeTrain(docs, 3).orderBy("word").collect().toSeq
    val b = Tokenizer.bpeTrain(docs, 3).orderBy("word").collect().toSeq
    assert(a == b)
  }

  test("fixture corpus trains without degenerate output") {
    val out = Tokenizer.bpeTrain(
      graft.sources.Tables.documents(spark, sfDir), 3)
      .collect()
    assert(out.nonEmpty)
    // every word's symbolization concatenates back to the word
    out.foreach { r =>
      assert(r.getString(2).replace(" ", "") == r.getString(0),
        s"symbolization of '${r.getString(0)}' lost characters: '${r.getString(2)}'")
    }
    // three rounds must have merged something: some word has fewer
    // symbols than characters
    assert(out.exists(r => r.getLong(3) < r.getString(0).length))
  }

  test("bpeEncode tokenizes docs with the trained merges (hand fixture)") {
    val d = Seq((1L, "en", "aaaa aaaa b"), (2L, "en", "low low lower"))
      .toDF("doc_id", "lang", "text")
    val got = Tokenizer.bpeEncode(d, Tokenizer.bpeTrain(d, 3))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // doc1: aaaa=[aa,aa]×2 + b=[b] → 5 tokens / 3 words
    // doc2: low=[low]×2 + lower=[low,e,r] → 5 tokens / 3 words
    assert(got == Map(
      1L -> ((3L, 5L, 1.666667)),
      2L -> ((3L, 5L, 1.666667))))
  }

  test("bpeEncode OOV words fall back to character count") {
    val train = Seq((1L, "en", "aa aa")).toDF("doc_id", "lang", "text")
    val serve = Seq((2L, "en", "aa zzz")).toDF("doc_id", "lang", "text")
    val got = Tokenizer.bpeEncode(serve, Tokenizer.bpeTrain(train, 1)).collect()
    // "aa" merged to one symbol; "zzz" untrained → 3 characters
    assert(got.length == 1 && got.head.getLong(3) == 4L)
  }

  test("holdout audit: hand-computed OOV and fertility micros, both branches of the fallback") {
    val train = Seq((0L, "en", "aa aa low low")).toDF("doc_id", "lang", "text")
    // 2 merges: (a,a)→aa then (l,o)→lo; trained: aa→1 sym, low→[lo,w]→2
    val trained = Tokenizer.bpeTrain(train, 2)
    val test = Seq((1L, "en", "aa low zzz"), (2L, "de", "aaaa"))
      .toDF("doc_id", "lang", "text")
    val got = Tokenizer.bpeHoldoutAudit(test, trained)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // en: aa(1 tok) + low(2) + zzz OOV(3 chars) → 3 words, 1 oov, 6 toks,
    //     oov 1e6 DIV 3 = 333333, fertility 6e6 DIV 3 = 2000000
    // de: aaaa OOV (untrained WORD even though its chars merge) → 4 chars
    assert(got == Map(
      "en" -> ((3L, 1L, 6L, 333333L, 2000000L)),
      "de" -> ((1L, 1L, 4L, 1000000L, 4000000L))))
  }

  test("sample elbow: hand-computed three-rate sweep incl. an empty inventory") {
    // eval = doc_id % 10 <> 0 → docs 1 and 2, words [aa bb zz cc];
    // docs 0 and 10 are training-side only (0 trains every rate,
    // 10 trains only the 1-in-10 rate)
    val docs = Seq(
      (0L, "aa bb"), (10L, "cc"),
      (1L, "aa bb zz"), (2L, "cc")).toDF("doc_id", "text")
    val t10 = Seq(("aa", 1L), ("bb", 1L), ("cc", 2L)).toDF("word", "n_syms")
    val t50 = Seq(("aa", 1L)).toDF("word", "n_syms")
    val t200 = Seq.empty[(String, Long)].toDF("word", "n_syms")
    val got = Tokenizer.bpeSampleElbow(docs, Seq(10L -> t10, 50L -> t50, 200L -> t200))
      .collect().toSeq.map(r => (0 to 7).map(r.getLong))
    // rate 1/10: zz OOV (2 chars) → 4 words, 1 oov, 1+1+2+2 = 6 tokens
    // rate 1/50: bb,zz,cc OOV → 3 oov, 1+2+2+2 = 7 tokens
    // rate 1/200: empty inventory → all 4 OOV, 8 tokens (char counts)
    assert(got == Seq(
      Seq(10L, 2L, 3L, 4L, 1L, 6L, 250000L, 1500000L),
      Seq(50L, 1L, 1L, 4L, 3L, 7L, 750000L, 1750000L),
      Seq(200L, 1L, 0L, 4L, 4L, 8L, 1000000L, 2000000L)))
  }

  test("bpeEncode totals agree with a manual word-level join") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val trained = Tokenizer.bpeTrain(docs, 3)
    val enc = Tokenizer.bpeEncode(docs, trained)
    val nTokens = enc.agg(org.apache.spark.sql.functions.sum("n_tokens")).collect()(0).getLong(0)
    val expected = docs
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("word"))
      .filter(org.apache.spark.sql.functions.col("word") =!= "")
      .join(trained, "word")
      .agg(org.apache.spark.sql.functions.sum("n_syms")).collect()(0).getLong(0)
    assert(nTokens == expected)
  }

  test("persisted trajectory equals a fresh retrain (read-state == retrain)") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val fresh = Tokenizer.bpeTrain(docs, rounds = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    val stored = Tokenizer.persistedTrajectory(spark, sfDir, rounds = 3).last
      .select(col("word"), col("cnt"),
        concat_ws(" ", col("syms")).as("bpe"),
        size(col("syms")).cast("long").as("n_syms"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(stored == fresh, "published BPE inventory must be bit-identical to retraining")
  }
}
