package graft
import java.nio.file.{Files, Paths}

/** Writes SparkEntry.oracleSql as JSON without starting Spark — feeds
  * tools/oracle_lint.py, the pre-commit guard against DuckDB typing the
  * oracle output wider than Spark's (HUGEINT vs int64 cost 12 green rows
  * in round 7; see VERDICT.md r7 "What's wrong #1").
  *
  * Usage: sbt "runMain graft.DumpOracles target/oracle_sql.json"
  */
object DumpOracles {
  /** JSON string escape shared with Verify: backslash, quote, and ALL
    * control chars (<0x20) — a tab or CR in builder-authored SQL would
    * otherwise break the driver's json.load. */
  def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def oracleJson: String = SparkEntry.oracleSql
    .map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" }
    .mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "target/oracle_sql.json"
    Option(Paths.get(out).getParent).foreach(Files.createDirectories(_))
    Files.writeString(Paths.get(out), oracleJson)
    println(s"[dump-oracles] wrote ${SparkEntry.oracleSql.size} oracles to $out")
  }
}
