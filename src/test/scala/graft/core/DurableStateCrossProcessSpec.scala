package graft.core

import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit

import org.scalatest.funsuite.AnyFunSuite

/** The commit protocol raced by REAL separate JVMs over a shared root —
  * the deployment shape the in-JVM specs cannot reach (POSIX advisory
  * locks are per-process, so the OS-lock legs of the claim/commit/
  * liveness protocol only light up across process boundaries). Children
  * run [[CasChildMain]] through [[DurableState.commitWith]]'s payload
  * seam (plain files instead of parquet — the PROTOCOL is what's under
  * test, and a SparkSession per child would add 10 s of noise per
  * trial). Proves, cross-process: (1) optimistic read-modify-write
  * commits lose no update under a genuine multi-JVM race; (2) every
  * surviving committed version is internally consistent (one writer's
  * payload); (3) a LIVE writer's claimed-but-unmarked dir is never
  * swept while its process holds the liveness lock, and is reclaimed
  * the moment the process dies — the reference's recovery-by-
  * reassignment liveness story (coordinator.go:87-107), lifted to
  * durable state across processes. */
class DurableStateCrossProcessSpec extends AnyFunSuite {

  private def freshRoot(tag: String): String =
    Paths.get(sys.props("java.io.tmpdir"),
      s"graft-durable-xproc-$tag-${System.nanoTime()}").toString

  private def javaBin: String =
    Paths.get(sys.props("java.home"), "bin", "java").toString

  // -Xmx256m: the children are Spark-free file-protocol workers; an
  // uncapped child JVM defaults to 25% of PHYSICAL RAM, and three of
  // those alongside the 8 GiB test JVM is exactly the memory pressure
  // that stopped the shared SparkContext in the round-13 driver run
  private def spawn(args: String*): Process =
    new ProcessBuilder(
      (Seq(javaBin, "-Xmx256m", "-cp", sys.props("java.class.path"),
        "graft.core.CasChildMain") ++ args): _*)
      .redirectErrorStream(true).start()

  test("racing writer JVMs under conditional commit lose no update: " +
      "K processes x N increments -> counter K*N, every surviving " +
      "version self-consistent") {
    val root = freshRoot("race")
    val (k, n) = (3, 5)
    val kids = (1 to k).map(w => spawn(root, "ctr", "rmw", w.toString,
      n.toString))
    kids.zipWithIndex.foreach { case (p, i) =>
      assert(p.waitFor(120, TimeUnit.SECONDS), s"child $i wedged")
      val out = new String(p.getInputStream.readAllBytes())
      assert(p.exitValue() == 0, s"child $i failed:\n$out")
    }
    val latest = DurableState.latestVersion(root, "ctr").get
    val payload = new String(Files.readAllBytes(
      DurableState.versionPath(root, "ctr", latest).resolve("n.txt")))
      .trim.split(":")
    assert(payload(0).toLong == (k * n).toLong,
      s"lost update across JVMs: counter ${payload(0)} after ${k * n} " +
        "increments")
    // every surviving committed version holds ONE writer's coherent
    // payload: both files agree on (value, writer) — a mixed publish
    // (two JVMs interleaving into one dir) would disagree
    DurableState.committedVersions(root, "ctr").foreach { v =>
      val d = DurableState.versionPath(root, "ctr", v)
      val a = new String(Files.readAllBytes(d.resolve("n.txt"))).trim
      val b = new String(Files.readAllBytes(d.resolve("n2.txt"))).trim
      assert(a == b, s"v$v published a mix of writers: $a vs $b")
    }
  }

  test("cross-process liveness: a LIVE child's claimed dir survives the " +
      "sweep however old; the same dir is reclaimed the moment the " +
      "process is killed (OS releases its advisory lock)") {
    val root = freshRoot("live")
    val child = spawn(root, "k", "hang")
    val rd = new java.io.BufferedReader(
      new java.io.InputStreamReader(child.getInputStream))
    val line = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var l: String = null
      while (l == null || !l.startsWith("CLAIMED ")) {
        assert(System.nanoTime() < deadline, "child never claimed")
        l = rd.readLine()
        assert(l != null, "child died before claiming")
      }
      l
    }
    val vd = Paths.get(line.stripPrefix("CLAIMED ").trim)
    try {
      // age the claim far past any grace window: ONLY the liveness lock
      // is left protecting it
      Files.setLastModifiedTime(vd,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 24L * 3600 * 1000))
      assert(DurableState.sweepOrphans(root, "k", graceMs = 1000L) == 0,
        "swept a LIVE process's in-flight claim")
      assert(Files.exists(vd), "live claim vanished")
    } finally {
      child.destroyForcibly()
      assert(child.waitFor(30, TimeUnit.SECONDS), "kill did not land")
    }
    // the claimant is dead: the OS released its lock at process exit,
    // and the very next sweep reclaims the orphan
    assert(DurableState.sweepOrphans(root, "k", graceMs = 1000L) == 1,
      "dead process's claim not reclaimed")
    assert(!Files.exists(vd), "reclaimed dir still on disk")
  }
}

/** Child-JVM worker for [[DurableStateCrossProcessSpec]] — talks only to
  * the shared durable root through [[DurableState]]'s protocol seam.
  *
  * `rmw` mode: N optimistic increments of a counter payload (read the
  * latest committed value, write value+1 conditioned on that base;
  * conflicts and pruned-base reads retry with a fresh base — exactly a
  * deployment's reload-derive-commit loop). Two payload files carry the
  * (value, writer) pair so a mixed publish is detectable.
  *
  * `hang` mode: claim a version, announce the dir, then sleep inside the
  * payload writer holding the claim-liveness lock until killed. */
object CasChildMain {
  def main(args: Array[String]): Unit = args match {
    case Array(root, kind, "rmw", writerId, n) =>
      var done = 0
      while (done < n.toInt) {
        try {
          val base = DurableState.latestVersion(root, kind)
          val cur = base.map { v =>
            new String(java.nio.file.Files.readAllBytes(
              DurableState.versionPath(root, kind, v).resolve("n.txt")))
              .trim.split(":")(0).toLong
          }.getOrElse(0L)
          DurableState.commitWith(root, kind, vd => {
            val payload = s"${cur + 1}:$writerId"
            java.nio.file.Files.write(vd.resolve("n.txt"),
              payload.getBytes)
            java.nio.file.Files.write(vd.resolve("n2.txt"),
              payload.getBytes)
          }, Some(base))
          done += 1
        } catch {
          // lost the race (stale base) — or the base we read was pruned
          // by retention before we finished reading it: re-derive
          case _: CommitConflictException => ()
          case _: java.nio.file.NoSuchFileException => ()
        }
      }
      println(s"DONE $writerId")
    case Array(root, kind, "hang") =>
      DurableState.commitWith(root, kind, vd => {
        println(s"CLAIMED $vd")
        System.out.flush()
        Thread.sleep(3600L * 1000)
      }, None): Unit
    case other =>
      System.err.println("usage: <root> <kind> rmw <id> <n> | " +
        s"<root> <kind> hang; got ${other.mkString(" ")}")
      sys.exit(2)
  }
}
