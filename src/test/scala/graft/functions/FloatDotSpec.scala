package graft.functions

import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

class FloatDotSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  private def df = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.5f, -1.5f), Array(2.0f, 2.0f))
  ).toDF("id", "a", "b")

  test("float_dot matches the declarative HOF spelling bit-for-bit") {
    GraftFunctions.register(spark)
    val got = df.select($"id", expr("float_dot(a, b)").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hof = df.select($"id",
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == hof)
    assert(got(1L) == 32.0 && got(2L) == -2.0)
  }

  test("float_dot raises on dimension mismatch instead of truncating") {
    GraftFunctions.register(spark)
    val bad = Seq((1L, Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("id", "a", "b")
    val e = intercept[Exception] {
      bad.select(expr("float_dot(a, b)")).collect()
    }
    def chain(t: Throwable): List[Throwable] =
      Option(t).map(x => x :: chain(x.getCause)).getOrElse(Nil)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => Option(t.getMessage).exists(_.contains("dimension mismatch"))))
  }
}
