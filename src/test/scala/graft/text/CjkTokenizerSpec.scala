package graft.text

import org.apache.spark.sql.SparkSession

import graft.SparkSpec
import graft.core.CosineAnalysis

/**
 * The reference's own headline use-case — pairwise similarity of CHINESE
 * articles (reference KeyWordsDemo.scala:19–27, src/test/data/ corpus) —
 * runnable offline: [[Tokenizer.tokensCjk]]'s character-bigram fallback
 * stands in for the ansj segmenter, and the demo pipeline shape
 * (tokenize → TF → dense cosine fit → all similarities) must produce
 * non-trivial similarities on unsegmented Chinese text.
 */
class CjkTokenizerSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  // Two articles on the same topic sharing phrases, one unrelated.
  private lazy val articles = Seq(
    (1L, "人工智能技术发展迅速 机器学习模型应用广泛"),
    (2L, "人工智能和机器学习技术的应用发展非常迅速"),
    (3L, "今天天气晴朗 我们一起去公园散步看花")
  ).toDF("doc_id", "text")

  test("cjk runs emit overlapping bigrams; latin words stay whole") {
    val t = Tokenizer.tokensCjk(
        Seq((1L, "Spark 引擎很好用")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(_.getString(1)).toSeq
    assert(t == Seq("Spark", "引擎", "擎很", "很好", "好用"))
  }

  test("mixed-script boundaries split without losing either side") {
    val t = Tokenizer.tokensCjk(
        Seq((1L, "用Spark做分析")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(_.getString(1)).toSeq
    assert(t == Seq("用", "Spark", "做分", "分析"))
  }

  test("isolated single CJK chars emit themselves") {
    val t = Tokenizer.tokensCjk(
        Seq((1L, "好 的 吗")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(_.getString(1)).toSeq
    assert(t == Seq("好", "的", "吗"))
  }

  test("demo shape on Chinese articles yields non-trivial similarities") {
    val tf = Tokenizer.termFrequency(
      Tokenizer.tokensCjk(articles, "doc_id", "text"))
    // a real TF matrix, not one whole-line token per document
    assert(tf.count() > 20)
    assert(tf.select("x").distinct().count() > 15)
    val sims = new CosineAnalysis(spark, axis = "y")
      .fit(tf, isSparse = false).allSimilarityValue
      .collect().map(r => (r.vector0, r.vector1) -> r.similarity_value).toMap
    assert(sims.size == 3)
    // shared-topic pair clearly above both unrelated pairs, and non-trivial
    assert(sims(("2", "1")) > 0.2, sims.toString)
    assert(sims(("2", "1")) > 2 * sims(("3", "1")), sims.toString)
    assert(sims(("2", "1")) > 2 * sims(("3", "2")), sims.toString)
  }
}
