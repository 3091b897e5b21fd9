package graft

import org.apache.spark.sql.SparkSession

import graft.core.CosineAnalysis
import graft.text.Tokenizer

/**
 * End-to-end demo of the engine's public API — the reference's KeyWordsDemo
 * pipeline shape (tokenize → TF → fit → query; reference:
 * src/test/scala/com/saltfish/run/KeyWordsDemo.scala:16–106) over the
 * synthetic documents table. Run: sbt "runMain graft.Demo [sfDir] [nDocs]".
 */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val nDocs = args.lift(1).map(_.toInt).getOrElse(10)
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(org.apache.spark.sql.functions.col("doc_id") < nDocs)
    // stop-word removal wired end to end, matching the reference demo's
    // pipeline shape (KeyWordsDemo.scala:31–43) — broadcast anti-join, not
    // the reference's driver-side collect
    import spark.implicits._
    val stopWords = graft.ext.TextAnalysis.Stopwords.toDF("word")
    val tf = Tokenizer.termFrequencyOf(docs, "doc_id", "text", Some(stopWords))
    val analysis = new CosineAnalysis(spark, axis = "y")

    val dense = analysis.fit(tf, isSparse = false)
    println(s"== dense (standard cosine), ${nDocs} docs ==")
    dense.allSimilarityValue.orderBy("vector0", "vector1").show(10, truncate = false)

    val sparse = analysis.fit(tf, isSparse = true)
    println(s"== sparse (intersection-restricted) ==")
    sparse.allSimilarityValue.orderBy("vector0", "vector1").show(10, truncate = false)

    println("== subset [0, 1, 2] ==")
    dense.similarity(Seq("0", "1", "2")).orderBy("vector0", "vector1").show(truncate = false)

    println("== dense physical plan ==")
    dense.allSimilarityValue.explain("formatted")
    spark.stop()
  }
}
