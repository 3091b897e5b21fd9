package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.SparkSpec
import graft.core.CosineAnalysis

class SourcesSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  test("readTextDocs: one doc per file, usable end to end") {
    val dir = Files.createTempDirectory("graft-src").toFile
    Files.writeString(new java.io.File(dir, "a.txt").toPath, "cat dog\ncat fish")
    Files.writeString(new java.io.File(dir, "b.txt").toPath, "dog fish bird")
    val docs = Sources.readTextDocs(spark, Seq(dir.getAbsolutePath + "/*.txt"))
    assert(docs.count() == 2)
    // full reference pipeline shape over file-sourced docs
    val tf = graft.text.Tokenizer.termFrequencyOf(docs, "doc_id", "text")
    val sims = new CosineAnalysis(spark).fit(tf, isSparse = false).allSimilarityValue
    assert(sims.count() == 1)
  }

  test("readTextLines: doc_id is the stable (file, line) ordinal") {
    val dir = Files.createTempDirectory("graft-lines").toFile
    Files.writeString(new java.io.File(dir, "a.txt").toPath, "first a\nsecond a\n")
    Files.writeString(new java.io.File(dir, "b.txt").toPath, "first b")
    val lines = Sources.readTextLines(spark, Seq(dir.getAbsolutePath + "/*.txt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    assert(lines.toSeq == Seq(0L -> "first a", 1L -> "second a", 2L -> "first b"))
  }

  test("readTextLines: a file ending in a blank line keeps its empty last row") {
    // ADVICE r3: regex $ also matches before a final terminator, so the old
    // "\r?\n$" strip ate TWO newlines and dropped the blank last line
    val dir = Files.createTempDirectory("graft-blank").toFile
    Files.writeString(new java.io.File(dir, "a.txt").toPath, "one\n\n")
    val lines = Sources.readTextLines(spark, Seq(dir.getAbsolutePath + "/*.txt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    assert(lines.toSeq == Seq(0L -> "one", 1L -> ""))
  }

  test("readTriplesCsv parses headered CSV into MatrixElement") {
    val f = Files.createTempFile("graft", ".csv")
    Files.writeString(f, "y,x,value\nA,t1,2\nA,t2,4\nB,t1,1\n")
    val m = Sources.readTriplesCsv(spark, f.toString)
    assert(m.count() == 3)
    assert(m.where($"y" === "A" && $"x" === "t2").head().value == 4.0)
  }

  test("readTriplesJson parses JSON lines") {
    val f = Files.createTempFile("graft", ".json")
    Files.writeString(f, """{"y":"A","x":"t1","value":2}
      |{"y":"B","x":"t1","value":7}""".stripMargin)
    val m = Sources.readTriplesJson(spark, f.toString)
    assert(m.collect().map(_.value).sorted.toSeq == Seq(2.0, 7.0))
  }

  test("writeParquet round-trips") {
    val dir = Files.createTempDirectory("graft-sink").toFile.getAbsolutePath + "/out"
    Sources.writeParquet(Seq(("A", 1.0)).toDF("k", "v"), dir)
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("ORC triples round-trip and match the parquet read byte for byte") {
    val base = Files.createTempDirectory("graft-orc").toFile.getAbsolutePath
    val triples = Seq(("A", "t1", 2.0), ("A", "t2", 4.0), ("B", "t1", 1.0))
      .toDF("y", "x", "value")
    Sources.writeOrc(triples, s"$base/orc")
    Sources.writeParquet(triples, s"$base/pq")
    val viaOrc = Sources.readTriplesOrc(spark, s"$base/orc")
      .collect().map(e => (e.y, e.x, e.value)).toSet
    val viaPq = Sources.readTriplesParquet(spark, s"$base/pq")
      .collect().map(e => (e.y, e.x, e.value)).toSet
    assert(viaOrc == viaPq && viaOrc.size == 3)
    // pushdown reaches the ORC scan: projection reads only the 2 columns
    val plan = Sources.readTriplesOrc(spark, s"$base/orc")
      .select("y", "value").queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("x:string"), plan)
  }
}
