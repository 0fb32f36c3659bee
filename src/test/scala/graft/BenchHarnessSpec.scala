package graft

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end self-test of the bench harness's config-pinning re-exec —
  * the mechanism has now broken four rounds in four different ways
  * (truncated stdout ×2, output-buffer overflow, and round 9's child
  * classpath crash under sbt's bg-jobs jar layout), so it gets its own
  * spec that reproduces the DRIVER'S invocation shape: a forked JVM with
  * a drifted heap (the launcher's `SPARK_DRIVER_MEM=91g` default, scaled
  * down here) running `graft.Bench` end to end. The harness must detect
  * the drift, re-exec a pinned 8 GiB child off `java.class.path` (the
  * round-9 fix — a jar-dir glob misses scala-library under sbt), and the
  * OUTER process must exit 0 with the stdout contract line present and
  * `config_ok:true`.
  *
  * `SPARK_GRAFT_BENCH_ONLY` restricts the run to two cheap queries at
  * sf0.001 so the whole path (drift check → re-exec → SparkSession →
  * warmup → 4 passes → contract line) costs seconds, not a full
  * 170-query bench; the subset is annotated in-band (`"subset":true`)
  * and bench_diff.py ignores such entries. */
class BenchHarnessSpec extends AnyFunSuite {

  test("drifted-heap Bench invocation re-execs pinned and prints the contract line") {
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_bench_selftest").toFile
    // a drifted heap, the driver's failure shape (91g in BENCH_r09) —
    // drifted LOW here (2g < pinned/2 triggers the same re-exec path)
    // so the outer child can never balloon next to the 8 GiB test JVM
    // on a small box (r14: the round-13 driver run lost its shared
    // SparkContext to exactly that memory pressure)
    val cmd = Seq(javaBin) ++ Bench.Jdk17AddOpens ++ Seq("-Xmx2g",
      "-cp", sys.props("java.class.path"), "graft.Bench")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_SF_DIR", SparkTest.sf0001)
    // keep the re-exec'd pinned child small: 4 cores is plenty for the
    // 2-query sf0.001 subset and bounds its RSS beside the test JVM
    pb.environment().put("SPARK_GRAFT_CPUS", "4")
    pb.environment().put("SPARK_GRAFT_BENCH_DIR", tmp.getAbsolutePath)
    pb.environment().put("SPARK_GRAFT_BENCH_ONLY",
      "q01_scan_project_limit,q03_hash_agg")
    pb.environment().remove("SPARK_GRAFT_BENCH_REEXEC")
    pb.environment().remove("SPARK_GRAFT_NO_REEXEC")
    val proc = pb.start()
    val outBuf = new StringBuilder
    val errBuf = new StringBuilder
    def pump(in: java.io.InputStream, buf: StringBuilder): Thread = {
      val t = new Thread(() => {
        val br = new java.io.BufferedReader(new java.io.InputStreamReader(in))
        var line = br.readLine()
        while (line != null) {
          buf.synchronized { buf.append(line).append('\n') }
          line = br.readLine()
        }
      })
      t.setDaemon(true); t.start(); t
    }
    val to = pump(proc.getInputStream, outBuf)
    val te = pump(proc.getErrorStream, errBuf)
    val finished = proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) proc.destroyForcibly()
    to.join(10000); te.join(10000)
    val out = outBuf.synchronized(outBuf.toString)
    val err = errBuf.synchronized(errBuf.toString)
    assert(finished, s"bench harness hung >300s; stderr tail:\n${err.takeRight(2000)}")
    assert(proc.exitValue() == 0,
      s"bench harness rc=${proc.exitValue()}; stderr tail:\n${err.takeRight(2000)}")
    // the drift path must actually have run (not a silent inline pass)
    assert(err.contains("re-execing under the BASELINE.md protocol"),
      s"drift re-exec did not trigger; stderr:\n${err.takeRight(2000)}")
    // the contract line: LAST stdout line, parseable, pinned config
    val contract = out.linesIterator.toSeq.reverse
      .find(_.startsWith("{\"metric\":\"total\""))
    assert(contract.isDefined, s"no contract line in stdout:\n$out")
    val line = contract.get
    assert(line.contains("\"config_ok\":true"),
      s"re-exec'd child not at pinned config: $line")
    assert(line.contains("\"subset\":true"),
      s"subset run must be annotated in-band: $line")
    assert(line.contains("\"n_queries\":2"), s"expected the 2-query subset: $line")
    assert(line.contains("\"n_failing\":0"), s"subset queries failed: $line")
    // the full per-query record landed beside the contract line
    assert(new java.io.File(tmp, "BENCH_LOCAL.json").exists(),
      "BENCH_LOCAL.json not written to SPARK_GRAFT_BENCH_DIR")
  }
}
