package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LeaseLock

/** The lock-lease contract (round-11 verdict #4/#6): in-JVM lease
  * semantics, then a REAL second JVM contending on the same lock —
  * the fleet scenario the single-process suite can't fake. */
class LockLeaseSpec extends AnyFunSuite {

  private val fs = FileSystem.getLocal(new Configuration())
  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"lease_$tag")
    d.toString
  }

  test("a live lease blocks a second writer; release unblocks") {
    val dir = tmpDir("live")
    val lock = new Path(s"$dir/__lock")
    LeaseLock.withLease(fs, lock, "t", ttlMs = 60000L) {
      val e = intercept[IllegalStateException] {
        LeaseLock.withLease(fs, lock, "t", ttlMs = 60000L)(())
      }
      assert(e.getMessage.contains("locked by a live writer"))
    }
    // released: immediate re-acquire succeeds
    LeaseLock.withLease(fs, lock, "t", ttlMs = 60000L)(())
  }

  test("a crashed writer's stale lease is stolen after the ttl") {
    val dir = tmpDir("stale")
    val lock = new Path(s"$dir/__lock")
    // simulate the crash: a lock file exists but nobody heartbeats it
    fs.createNewFile(lock)
    fs.setTimes(lock, System.currentTimeMillis() - 5000L, -1)
    // within ttl: still blocked (a paused-but-alive writer keeps its lease)
    intercept[IllegalStateException] {
      LeaseLock.withLease(fs, lock, "t", ttlMs = 60000L)(())
    }
    // past ttl: stolen unattended, body runs, lock cleanly released after
    var ran = false
    LeaseLock.withLease(fs, lock, "t", ttlMs = 1000L) { ran = true }
    assert(ran)
    assert(!fs.exists(lock))
  }

  test("the heartbeat keeps a long-running holder's lease fresh") {
    val dir = tmpDir("beat")
    val lock = new Path(s"$dir/__lock")
    // ttl 400ms, body runs 1.2s — 3 ttls; without the heartbeat the
    // mid-flight contender below would steal the lease out from under
    // the live holder
    LeaseLock.withLease(fs, lock, "t", ttlMs = 400L) {
      Thread.sleep(1200L)
      val e = intercept[IllegalStateException] {
        LeaseLock.withLease(fs, lock, "t", ttlMs = 400L)(())
      }
      assert(e.getMessage.contains("live writer"))
    }
  }

  test("a usurped-but-alive writer is fenced: no cascade delete, commit aborts") {
    // the round-12 verdict #2 scenario: A pauses past the TTL, B steals,
    // A resumes. Pre-fencing, A's heartbeat kept refreshing B's lock and
    // A's release DELETED it, letting C in while B ran — three writers
    // from one GC pause. With the per-acquisition token: A's heartbeat
    // goes silent, A's commit fence throws, A's release leaves B's lock,
    // and C still fails fast against B's live lease.
    val dir = tmpDir("fence")
    val lock = new Path(s"$dir/__lock")
    var fenceThrew = false
    var tokenStillBs = false
    val e = intercept[IllegalStateException] {
      LeaseLock.withLease(fs, lock, "A", ttlMs = 400L) {
        // simulate B's post-TTL steal while A is "paused": the lock file
        // now carries B's token (rename-away + fresh stamp ends here)
        val o = fs.create(lock, true)
        o.write("owner=B@host epoch_ms=0\ntoken=b-token\n".getBytes("UTF-8"))
        o.close()
        // let ≥2 of A's heartbeats fire: each must read-verify, see the
        // foreign token, and touch NOTHING (the old code's setTimes +
        // release-delete pair is exactly the cascade under test)
        Thread.sleep(300L)
        // the commit-point fence (IndexStore.commitEra / TableStore swap
        // / Versioned.commitVersion all call this) must abort A here
        fenceThrew =
          intercept[IllegalStateException](LeaseLock.fenceCheck())
            .getMessage.contains("usurped")
        // A's heartbeat must not have re-stamped A's token over B's
        val in = fs.open(lock)
        val buf = new Array[Byte](512)
        val n = in.read(buf); in.close()
        tokenStillBs = new String(buf, 0, n, "UTF-8").contains("token=b-token")
      }
    }
    assert(e.getMessage.contains("usurped"),
      s"A's exit must surface the usurpation loudly, got: ${e.getMessage}")
    assert(fenceThrew, "the commit fence let a usurped writer publish")
    assert(tokenStillBs, "A's heartbeat overwrote B's lock file")
    assert(fs.exists(lock), "A's release cascade-deleted B's live lease")
    // C must fail fast while B's lease is fresh — mutual exclusion held
    intercept[IllegalStateException] {
      LeaseLock.withLease(fs, lock, "C", ttlMs = 60000L)(())
    }
  }

  // ---- cross-process: a REAL second JVM --------------------------------

  private def spawnContender(dir: String, holdMs: Long,
      ttlMs: Long): Process = {
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val pb = new ProcessBuilder(
      java, "-cp", cp, "-Xmx256m", "graft.LockContender",
      dir, holdMs.toString, ttlMs.toString)
    pb.redirectErrorStream(true)
    pb.start()
  }

  private def awaitLine(p: Process, want: String, timeoutMs: Long): Boolean = {
    val r = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream))
    val deadline = System.currentTimeMillis() + timeoutMs
    var line = r.readLine()
    while (line != null && !line.contains(want) &&
        System.currentTimeMillis() < deadline)
      line = r.readLine()
    line != null && line.contains(want)
  }

  test("two JVMs contend: the loser fails fast while the holder lives") {
    val dir = tmpDir("xproc")
    val p = spawnContender(dir, holdMs = 30000L, ttlMs = 60000L)
    try {
      assert(awaitLine(p, "HELD", 30000L), "contender never took the lock")
      // the OTHER process holds a live lease: this JVM must fail fast
      val e = intercept[IllegalStateException] {
        LeaseLock.withLease(fs, new Path(s"$dir/__lock"), "t",
          ttlMs = 60000L)(())
      }
      assert(e.getMessage.contains("live writer"))
    } finally { p.destroyForcibly(); p.waitFor() }
  }

  test("a KILLED writer JVM is superseded unattended after the ttl") {
    val dir = tmpDir("xkill")
    val lock = new Path(s"$dir/__lock")
    val p = spawnContender(dir, holdMs = -1L, ttlMs = 600L)
    try {
      assert(awaitLine(p, "HELD", 30000L), "contender never took the lock")
      p.destroyForcibly()
      p.waitFor()
      // the dead holder's heartbeat has stopped; its last touch ages out
      assert(fs.exists(lock), "kill should leave the stale lock behind")
      val deadline = System.currentTimeMillis() + 10000L
      var stolen = false
      while (!stolen && System.currentTimeMillis() < deadline) {
        try {
          LeaseLock.withLease(fs, lock, "t", ttlMs = 600L) { stolen = true }
        } catch {
          case _: IllegalStateException => Thread.sleep(150L)
        }
      }
      assert(stolen, "stale lease was never stolen — manual unlock " +
        "would have been required (the exact round-11 regression)")
      assert(!fs.exists(lock))
    } finally { p.destroyForcibly(); p.waitFor() }
  }
}
