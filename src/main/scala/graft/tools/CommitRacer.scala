package graft.tools

import graft.operators.{CommitConflictException, CommitLog}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Cross-process commit racer — a tiny main that attempts ONE
  * [[CommitLog.commitNext]] against a sink from a caller-supplied base
  * generation and reports the outcome through its exit code:
  * 0 = won the CAS, 42 = lost ([[CommitConflictException]]), anything
  * else = unexpected failure. CommitProtocolSpec launches this in a
  * SECOND JVM racing the in-process writer on the same sink, proving
  * the exclusive-publish primitive holds across real process
  * boundaries (hard-link exclusivity is a kernel guarantee, not a
  * JVM-lock artifact — this is the test that shows it). No
  * SparkSession: the commit protocol is pure Hadoop FileSystem.
  *
  * Args: `<sinkPath> <baseGen> <fileToCommit>` — commits the base
  * generation's live set plus `fileToCommit` as `baseGen + 1`.
  */
object CommitRacer {
  def main(args: Array[String]): Unit = {
    val Array(sink, baseGenStr, marker) = args
    val p = new Path(sink)
    val fs = p.getFileSystem(new Configuration())
    val baseGen = baseGenStr.toLong
    val live = CommitLog.committed(fs, p) match {
      case Some((g, files)) if g == baseGen => files
      case Some((_, files)) => files // stale base: commitNext will throw
      case None => Nil
    }
    try {
      CommitLog.commitNext(fs, p, baseGen, live :+ marker)
      sys.exit(0)
    } catch {
      case _: CommitConflictException => sys.exit(42)
    }
  }
}
