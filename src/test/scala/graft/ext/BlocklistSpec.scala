package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/** Blocklist density gate (TextAnalysis.blocklistGate): gates on hit
  * DENSITY, not any-hit — concentration blocks, incidental use survives. */
class BlocklistSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  private lazy val docs = Seq(
    (1L, "bad bad bad word here"),     // 3/5 = 0.6 density
    (2L, "one bad token in a long clean document of words"), // 1/10 = 0.1
    (3L, "entirely clean text")        // 0/3 = 0.0
  ).toDF("doc_id", "text")

  test("density and the gate are hand-exact; incidental hits survive") {
    val rows = TextAnalysis.blocklistGate(docs, "doc_id", "text",
      Seq("bad"), maxDensity = 0.2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Long]("n_hits") == 3L)
    assertApprox(rows(1L).getAs[Double]("density"), 0.6, 1e-6)
    assert(rows(1L).getAs[Boolean]("blocked"))
    assertApprox(rows(2L).getAs[Double]("density"), 0.1, 1e-6)
    assert(!rows(2L).getAs[Boolean]("blocked")) // one hit in ten tokens passes
    assert(rows(3L).getAs[Long]("n_hits") == 0L)
    assert(!rows(3L).getAs[Boolean]("blocked"))
  }

  test("stateless stream-safety: the same function on a MemoryStream matches batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = TextAnalysis.blocklistGate(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", Seq("bad"), maxDensity = 0.2)
      .writeStream.format("memory").queryName("blocklist_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, "bad bad bad word here"), (2L, "one bad token in a long clean document of words"))
      q.processAllAvailable()
      val got = spark.table("blocklist_out")
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_hits"), r.getAs[Boolean]("blocked"))).toMap
      assert(got(1L) == ((3L, true)))
      assert(got(2L) == ((1L, false)))
    } finally q.stop()
  }

  test("multi-pattern lists count every member") {
    val r = TextAnalysis.blocklistGate(docs, "doc_id", "text",
      Seq("bad", "word", "here"), maxDensity = 0.99)
      .where($"doc_id" === 1L).collect().head
    assert(r.getAs[Long]("n_hits") == 5L)
    assert(r.getAs[Boolean]("blocked")) // density 1.0 > 0.99
  }
}
