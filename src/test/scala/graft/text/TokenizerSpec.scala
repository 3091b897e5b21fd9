package graft.text

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

class TokenizerSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  private lazy val docs = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "a cat  and a dog"), // double space → empty token must be dropped
    (2L, "dog")
  ).toDF("doc_id", "text")

  test("tokens splits on whitespace and drops empties") {
    val t = Tokenizer.tokens(docs, "doc_id", "text")
    assert(t.columns.toSeq == Seq("doc", "token"))
    assert(t.count() == 6 + 5 + 1)
    assert(t.where($"token" === "").count() == 0)
  }

  test("removeStopWords is a left-anti join on the token column") {
    val stops = Seq("the", "a").toDF("w")
    val t = Tokenizer.removeStopWords(Tokenizer.tokens(docs, "doc_id", "text"), stops)
    assert(t.count() == 4 + 3 + 1)
    assert(t.where($"token".isin("the", "a")).count() == 0)
  }

  test("termFrequency counts duplicate tokens per doc") {
    val tf = Tokenizer.termFrequency(Tokenizer.tokens(docs, "doc_id", "text"))
      .collect().map(m => (m.y, m.x) -> m.value).toMap
    assert(tf((0.toString, "the")) == 2.0)
    assert(tf(("1", "a")) == 2.0)
    assert(tf(("2", "dog")) == 1.0)
    assert(!tf.contains(("2", "cat")))
  }

  test("tfIdf: corpus-wide terms weigh 0, rarer terms ln(N/df)-scaled") {
    val tf = Tokenizer.termFrequency(Tokenizer.tokens(docs, "doc_id", "text"))
    val w = Tokenizer.tfIdf(tf).collect().map(m => (m.y, m.x) -> m.value).toMap
    // no term appears in all 3 docs except... check "cat" df=2, "dog" df=2
    assertApprox(w(("0", "cat")), 1.0 * math.log(3.0 / 2.0))
    assertApprox(w(("1", "a")), 2.0 * math.log(3.0 / 1.0)) // tf=2, df=1
    // a term present in EVERY doc gets exactly zero
    val all = Seq((0L, "x y"), (1L, "x z"), (2L, "x w")).toDF("doc_id", "text")
    val wAll = Tokenizer.tfIdf(
      Tokenizer.termFrequency(Tokenizer.tokens(all, "doc_id", "text")))
      .collect().map(m => (m.y, m.x) -> m.value).toMap
    assert(wAll(("0", "x")) == 0.0 && wAll(("1", "x")) == 0.0)
  }

  test("tfIdf builds its plan lazily — no Spark job at construction") {
    val sc = spark.sparkContext
    val other = new java.util.concurrent.atomic.AtomicInteger(0)
    val sentinel = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (js.properties != null &&
            js.properties.getProperty("spark.jobGroup.id") == "tfidf-sentinel")
          sentinel.incrementAndGet()
        else other.incrementAndGet()
    }
    sc.addSparkListener(listener)
    try {
      val planned = Tokenizer.tfIdf(
        Tokenizer.termFrequency(Tokenizer.tokens(docs, "doc_id", "text")))
      planned.queryExecution.optimizedPlan // force full analysis/optimization
      // sentinel: listener events arrive in order, so once a sentinel job
      // is visible, any job fired during plan construction would be too
      sc.setJobGroup("tfidf-sentinel", "laziness sentinel")
      try spark.range(1).count() finally sc.clearJobGroup()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (sentinel.get() == 0 && System.nanoTime() < deadline) Thread.sleep(20)
      assert(sentinel.get() > 0, "sentinel job never observed")
      assert(other.get() == 0, s"plan construction ran ${other.get()} job(s)")
      assert(planned.count() > 0) // the plan still computes
    } finally sc.removeSparkListener(listener)
  }

  test("termFrequencyOf composes tokenize → stop-words → TF") {
    val stops = Seq("the", "a").toDF("w")
    val tf = Tokenizer.termFrequencyOf(docs, "doc_id", "text", Some(stops))
    assert(tf.where($"x".isin("the", "a")).count() == 0)
    assert(tf.where($"y" === "0" && $"x" === "cat").head().value == 1.0)
  }
}
