package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Second-JVM harness for the cross-process lock soak: acquires the
  * lease on `<dir>/__lock` and holds it for `<holdMs>`, printing
  * `HELD` once inside the critical section so the parent test can
  * synchronize. No SparkSession — the lock protocol is pure
  * filesystem, which is the point: any writer JVM in a fleet speaks
  * it. With `holdMs` = -1 the process blocks forever (the parent
  * kills it to simulate a crashed writer whose lease must expire).
  *
  * Usage: graft.LockContender <dir> <holdMs> [ttlMs] */
object LockContender {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val holdMs = args(1).toLong
    val ttlMs = if (args.length > 2) args(2).toLong
      else graft.operators.LeaseLock.DefaultTtlMs
    val fs = FileSystem.getLocal(new Configuration())
    fs.mkdirs(new Path(dir))
    graft.operators.LeaseLock.withLease(
        fs, new Path(s"$dir/__lock"), s"store $dir", ttlMs) {
      println("HELD")
      System.out.flush()
      if (holdMs < 0) Thread.sleep(Long.MaxValue) else Thread.sleep(holdMs)
    }
    println("RELEASED")
  }
}
