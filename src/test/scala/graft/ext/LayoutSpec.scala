package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/** [[Layout]]: the lang-partitioned layout must agree row-for-row with
  * the plain table, and the sliced scan must prune at the DIRECTORY
  * level (PartitionFilters), not post-scan. */
class LayoutSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("langSlice rows equal the plain filter's rows") {
    assume(new java.io.File(dir).isDirectory, s"$dir missing")
    val plain = spark.read.parquet(s"$dir/documents.parquet")
      .where($"lang" === "en")
      .select("doc_id", "text", "source", "n_chars")
      .collect().map(_.toString).sorted.toSeq
    val sliced = Layout.langSlice(spark, dir, "en")
      .select("doc_id", "text", "source", "n_chars")
      .collect().map(_.toString).sorted.toSeq
    assert(plain.nonEmpty && sliced == plain)
  }

  test("the slice plans a PartitionFilter, zero post-scan lang filtering") {
    assume(new java.io.File(dir).isDirectory, s"$dir missing")
    val plan = Layout.langSlice(spark, dir, "en")
      .queryExecution.executedPlan.toString
    // the predicate landed as directory pruning...
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(plan).isDefined, plan)
    // ...and no lang predicate survives as a data filter (the scan never
    // deserializes another language's rows)
    val dataFilters = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    assert(!dataFilters.contains("lang"), plan)
  }

  test("the partitioned layout is stream-native: writeStream.partitionBy(lang)") {
    // the ingest-time form: documents partitioned as they ARRIVE, so the
    // pruning lever exists from the first micro-batch — no re-layout job
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_part").toFile
    val in = MemoryStream[(Long, String, String)]
    val q = in.toDF().toDF("doc_id", "text", "lang")
      .writeStream.format("parquet")
      .partitionBy("lang")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append").start()
    try {
      in.addData((1L, "hello", "en"), (2L, "bonjour", "fr"), (3L, "world", "en"))
      q.processAllAvailable()
    } finally q.stop()
    // directory layout carries the partition values
    val dirs = new java.io.File(s"$tmp/out").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    // _spark_metadata is the streaming sink's commit log, not a partition
    assert(dirs - "_spark_metadata" == Set("lang=en", "lang=fr"), dirs)
    // and the sliced read prunes exactly like the batch layout
    val plan = spark.read.parquet(s"$tmp/out").where($"lang" === "en")
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(plan).isDefined, plan)
    val en = spark.read.parquet(s"$tmp/out").where($"lang" === "en")
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(en.toSeq == Seq(1L, 3L))
  }

  test("the layout write is idempotent per (JVM, dir)") {
    assume(new java.io.File(dir).isDirectory, s"$dir missing")
    val p1 = Layout.docsByLangPath(spark, dir)
    val mtime = new java.io.File(p1, "_SUCCESS").lastModified()
    val p2 = Layout.docsByLangPath(spark, dir)
    assert(p1 == p2)
    assert(new java.io.File(p2, "_SUCCESS").lastModified() == mtime,
      "second call re-wrote the layout")
  }
}
