package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/**
 * The oracle TYPE lint as a suite gate (VERDICT r8 ask #3): DuckDB plans
 * a bare top-level `SUM(BIGINT)` as HUGEINT (and money expressions as
 * DECIMAL), the driver hashes the typed representation, and the row
 * hash-fails even when every value matches — the regression class that
 * cost round 7 twelve green rows. tools/oracle_lint.py has guarded this
 * as a dev script since r8; this spec makes it impossible to forget:
 * every declared oracle is planned with LIMIT 0 by the SAME lint code,
 * inside `sbt test`.
 *
 * The lint needs the driver-side DuckDB (a Python module — deliberately
 * NOT a library dependency), so the spec shells out to python3 and
 * CANCELS (not passes) when python3/duckdb/testdata are absent — on the
 * driver host all three exist and the gate is real.
 */
class OracleLintSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private val lint = "tools/oracle_lint.py"

  private def haveDuckdb: Boolean =
    try {
      import scala.sys.process._
      Seq("python3", "-c", "import duckdb").! == 0
    } catch { case _: Throwable => false }

  private def runLint(oracleJson: String): (Int, String) = {
    import scala.sys.process._
    val f = Files.createTempFile("oracle_lint", ".json")
    Files.writeString(f, oracleJson)
    val out = new StringBuilder
    val code = Seq("python3", lint, sfDir, f.toString)
      .!(ProcessLogger(l => out.append(l).append('\n'), _ => ()))
    Files.deleteIfExists(f)
    (code, out.toString)
  }

  test("every declared oracle plans with driver-hashable output types") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    assume(Files.exists(Paths.get(lint)), s"$lint missing (run sbt from the repo root)")
    assume(haveDuckdb, "python3+duckdb not available on this host")
    // DumpOracles.oracleJson needs no Spark session — the full contract's
    // oracle strings, exactly as Verify ships them to the driver
    val (code, out) = runLint(DumpOracles.oracleJson)
    assert(code == 0, s"oracle lint failed:\n$out")
    assert(out.contains("0 type fails"), out)
  }

  test("the lint catches a planted bare SUM(BIGINT) (HUGEINT) oracle") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    assume(Files.exists(Paths.get(lint)), s"$lint missing")
    assume(haveDuckdb, "python3+duckdb not available on this host")
    val planted = """{"planted_bad":
      "SELECT SUM(CAST(l_quantity AS BIGINT)) AS s FROM lineitem"}"""
    val (code, out) = runLint(planted)
    assert(code == 1, s"lint should fail on a HUGEINT output, got:\n$out")
    assert(out.contains("HUGEINT"), out)
  }

  test("the lint catches an oracle that does not plan at all") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    assume(Files.exists(Paths.get(lint)), s"$lint missing")
    assume(haveDuckdb, "python3+duckdb not available on this host")
    val (code, out) = runLint("""{"broken": "SELECT FROM nowhere x y z"}""")
    assert(code == 1, s"lint should fail on unplannable SQL, got:\n$out")
  }
}
