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

  test("zValue interleaves bits exactly; hand-checked corners") {
    val rows = Seq((0L, 0L), (7L, 0L), (0L, 7L), (5L, 3L), (63L, 63L))
      .toDF("a", "b")
      .select($"a", $"b", Layout.zValue(spark, "a", "b", 6).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows((0L, 0L)) === 0L)
    assert(rows((7L, 0L)) === 21L)     // a bits at even positions: 10101
    assert(rows((0L, 7L)) === 42L)     // b bits at odd positions: 101010
    assert(rows((5L, 3L)) === 27L)     // 101 ⨯ 011 → 011011
    assert(rows((63L, 63L)) === 4095L) // all 12 low bits set
  }

  test("z-order clustering prunes a box on EITHER axis; single-axis sort cannot") {
    // full 64x64 grid, 16 files of 256 rows each
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a, b))
      .toDF("a", "b")
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder").toFile
    Layout.zOrderWrite(grid, "a", "b", bits = 6, nFiles = 16, s"$tmp/z")
    // the comparison layout: sorted on b alone, same file count
    grid.repartitionByRange(16, $"b").sortWithinPartitions("b")
      .write.parquet(s"$tmp/b")
    import org.apache.spark.sql.functions.input_file_name
    def filesMatching(path: String, cond: String): Long =
      spark.read.parquet(path).where(cond)
        .select(input_file_name()).distinct().count()
    def totalFiles(path: String): Long =
      spark.read.parquet(path).select(input_file_name()).distinct().count()
    assert(totalFiles(s"$tmp/z") === 16L)
    // a-axis box: under z-order, a < 8 zeroes the three high even bit
    // positions, so qualifying rows live in at most half the z-range;
    // under the b-sort, EVERY file contains a < 8 rows
    assert(filesMatching(s"$tmp/z", "a < 8") <= 8L)
    assert(filesMatching(s"$tmp/b", "a < 8") === 16L)
    // the 2-D corner box is 64 consecutive z values — ONE file
    assert(filesMatching(s"$tmp/z", "a < 8 AND b < 8") === 1L)
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
