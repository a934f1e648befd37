package graft

import graft.SparkTestBase

/** The CLI `q` pipeline (reference src/bin/q.rs is a 49-line stub that
  * parses only --version; SURVEY §2.1 specifies the finished form). The
  * spec drives Cli.execute — the exact code path main wraps — so the
  * oracle row `cli_q` and these assertions cover one implementation. */
class CliSpec extends SparkTestBase {

  private def run(args: Array[String]): (Int, Seq[String], Seq[String]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val err = scala.collection.mutable.ArrayBuffer.empty[String]
    val code = Cli.execute(spark, args, out += _, err += _)
    (code, out.toSeq, err.toSeq)
  }

  test("--version prints the version and exits 0 without touching Spark") {
    var touched = false
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val code = Cli.execute({ touched = true; spark },
      Array("--version"), out += _, _ => ())
    assert(code == 0 && out == Seq(Cli.Version) && !touched)
  }

  test("missing args and parse errors exit 2 before a session is demanded") {
    var touched = false
    val err = scala.collection.mutable.ArrayBuffer.empty[String]
    assert(Cli.execute({ touched = true; spark }, Array(".only-query"),
      _ => (), err += _) == 2)
    assert(Cli.execute({ touched = true; spark }, Array(".[unclosed", "/nope"),
      _ => (), err += _) == 2)
    assert(!touched && err.size == 2)
    assert(err.head.startsWith("usage:") && err(1).startsWith("query error:"))
  }

  test("jsonl file streams canonical outputs; per-record errors go to stderr") {
    val f = java.nio.file.Files.createTempFile("cli_spec", ".jsonl")
    try {
      java.nio.file.Files.write(f,
        Seq("""{"name":"ALGERIA","k":0}""",
            """{"k":1}""",
            "not json at all").mkString("\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val (code, out, err) = run(Array(".name", f.toString))
      assert(code == 0)
      // canonical serialization; a missing key is an error-entry in the
      // reference semantics (ops.rs:264-280), routed to stderr like the
      // unparseable record
      assert(out == Seq("\"ALGERIA\""))
      assert(err.count(_.startsWith("error:")) == 1 &&
        err.count(_.startsWith("input error:")) == 1, s"err=$err")
    } finally java.nio.file.Files.deleteIfExists(f)
  }
}
