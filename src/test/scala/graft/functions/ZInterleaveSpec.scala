package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZInterleaveSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  /** The declarative fold twin — the spelling the codegen expression
    * replaces; must stay bit-identical on EVERY int64 input. */
  private def foldSql(bits: Int): String =
    s"""aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT), (acc, i) ->
       |  acc
       |  + shiftleft(shiftright(a, i) & 1, 2 * i)
       |  + shiftleft(shiftright(b, i) & 1, 2 * i + 1))""".stripMargin

  test("z_interleave matches the declarative fold on all input classes") {
    GraftFunctions.register(spark)
    // in-range, out-of-range (high bits ignored), negatives (arithmetic
    // shift in both spellings), extremes
    val vals = Seq(0L, 1L, 7L, 63L, 64L, 1000L, -1L, -63L,
      Long.MaxValue, Long.MinValue)
    val df = (for (a <- vals; b <- vals) yield (a, b)).toDF("a", "b")
    for (bits <- Seq(1, 6, 31)) {
      val rows = df.select($"a", $"b",
        expr(s"z_interleave(a, b, $bits)").as("z"),
        expr(foldSql(bits)).as("zf")).collect()
      rows.foreach { r =>
        assert(r.getLong(2) == r.getLong(3),
          s"bits=$bits a=${r.getLong(0)} b=${r.getLong(1)}: " +
            s"expr=${r.getLong(2)} fold=${r.getLong(3)}")
      }
    }
  }

  test("z_interleave stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    // a real leaf (range), not a LocalTableScan the optimizer folds away;
    // the "*(n)" node prefix is executedPlan's whole-stage-codegen marker
    val plan = spark.range(10)
      .select(expr("z_interleave(id, id + 1, 6)"))
      .queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[z_interleave".r.findFirstIn(plan).isDefined, plan)
  }

  test("z_interleave rejects a non-literal bits argument") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      Seq((1L, 2L, 3)).toDF("a", "b", "n")
        .select(expr("z_interleave(a, b, n)")).collect()
    }
    def chain(t: Throwable): List[Throwable] =
      Option(t).map(x => x :: chain(x.getCause)).getOrElse(Nil)
    assert(chain(e).exists(t =>
      Option(t.getMessage).exists(_.contains("literal"))))
  }
}
