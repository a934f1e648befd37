package graft.operators

import graft.SparkTestBase

/** Routine check for the Spark 4.1.2 union-partitioning defect fence
  * (r16 verdict ask #5). Every graft session builder sets
  * `spark.sql.unionOutputPartitioning=false` because 4.1.2's UnionExec
  * claims its children's hash partitioning but executes a flat UnionRDD
  * (full analysis in Checkpoints.scala; deterministic repro in
  * tools/union_partitioning_repro.sh, which EXIT-FLIPS when Spark fixes
  * the bug; drafted upstream issue text in NOTES.md round 16).
  *
  * FENCE RETIREMENT CRITERIA — when the version tripwire below fails
  * after a Spark upgrade:
  *   1. run `tools/union_partitioning_repro.sh` (one command; needs
  *      `sbt compile` output).
  *   2. exit 0 (defect fixed): delete the
  *      `spark.sql.unionOutputPartitioning=false` line from every
  *      session builder (`grep -rn unionOutputPartitioning src/` lists
  *      them all) and delete this spec + the repro tool.
  *   3. exit 1 (defect still present): re-pin `PinnedSparkVersion`
  *      to the new version and keep the fence.
  *
  * The repro itself can be run under the test harness with
  * `SPARK_GRAFT_CHECK_UNION_DEFECT=1 sbt "testOnly *UnionFenceSpec"`
  * (gated: it forks a JVM and runs the miscomputing query twice, ~40 s —
  * too heavy for every `sbt test`). */
class UnionFenceSpec extends SparkTestBase {

  private val PinnedSparkVersion = "4.1.2"

  test("version tripwire: the union-partitioning fence was validated on exactly this Spark") {
    assert(spark.version == PinnedSparkVersion,
      s"Spark moved ${PinnedSparkVersion} -> ${spark.version}: run " +
        "tools/union_partitioning_repro.sh and follow the fence-retirement " +
        "criteria in UnionFenceSpec's scaladoc (exit 0 = retire the fence, " +
        "exit 1 = re-pin this version)")
  }

  test("union defect reproduces on this Spark build (env-gated, forks a JVM)") {
    assume(sys.env.get("SPARK_GRAFT_CHECK_UNION_DEFECT").contains("1"),
      "set SPARK_GRAFT_CHECK_UNION_DEFECT=1 to run the forked repro")
    val repoRoot = new java.io.File(".").getCanonicalFile
    val script = new java.io.File(repoRoot, "tools/union_partitioning_repro.sh")
    assert(script.isFile, s"repro script missing at $script")
    val pb = new ProcessBuilder(script.getAbsolutePath)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val code = proc.waitFor()
    // bash -e propagates run_main's exit; the tool exits 1 while the
    // defect reproduces and 0 once Spark fixes it — on the pinned build
    // anything but 1 means the repro (or the fence rationale) broke
    assert(code == 1,
      s"expected the 4.1.2 defect to reproduce (exit 1), got $code.\n$out")
  }
}
