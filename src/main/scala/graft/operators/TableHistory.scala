package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** `DESCRIBE HISTORY` for [[CommitLog]]-managed sinks — the
  * operational audit every production table format exposes (Delta's
  * DESCRIBE HISTORY, Iceberg's snapshots metadata table), derived
  * ENTIRELY from the retained manifests: no history journal is ever
  * written, because the manifest DELTAS already encode what each
  * commit did. Per generation the row reports the file motion
  * (added/removed against the previous retained generation), the
  * record-family footprint (DV files + mark cardinalities, stats
  * coverage, constraints, txn ledger apps, mapping debt), and an
  * INFERRED operation kind — classified from the shape of the delta,
  * most-specific first (a metadata-only commit that changed column
  * mappings is `schema-evolve` even though zero files moved; adds
  * plus DV growth is the merge-on-read signature; adds plus removes
  * is a rewrite). Cost: one cached manifest parse per retained
  * generation, driver-side — the same O(retained) bound as
  * [[CommitLog.vacuum]], and exactly why retention
  * ([[CommitLog.expireGenerations]]) bounds it.
  *
  * The reference's pipeline history lives in its orchestrator's run
  * log (`dags/idh_etl.py` task metadata); a self-contained table
  * needs the audit derivable from the table alone. */
object TableHistory {

  /** One row per retained generation, ascending. */
  def history(spark: SparkSession, path: String): DataFrame = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens = CommitLog.generations(fs, hPath)
    require(gens.nonEmpty, s"history: $path has no commit log")
    val ms = gens.map(g => g -> CommitLog.manifestAt(fs, hPath, g))
    val emptyM = CommitLog.Manifest(Nil, Map.empty, Map.empty,
      Map.empty)
    val rows = ms.zip(emptyM +: ms.map(_._2).dropRight(1)).map {
      case ((g, m), p) =>
        val pSet = p.files.toSet
        val mSet = m.files.toSet
        val added = m.files.count(!pSet(_))
        val removed = p.files.count(!mSet(_))
        val dvDelta = m.dvs != p.dvs
        val mapDelta = m.colmaps != p.colmaps ||
          m.coltypes != p.coltypes
        val checkDelta = m.checks != p.checks
        val statsDelta = m.stats != p.stats
        val txnDelta = m.txns != p.txns
        val quietFiles = added == 0 && removed == 0
        val op =
          if (g == gens.head)
            (if (g == 0L) "bootstrap" else "retained-base")
          else if (mapDelta && quietFiles) "schema-evolve"
          else if (checkDelta && quietFiles && !dvDelta) "constraint"
          else if (statsDelta && quietFiles && !dvDelta &&
            !checkDelta && !mapDelta) "analyze"
          else if (dvDelta && quietFiles) "delete"
          else if (added > 0 && removed == 0 && dvDelta) "merge-on-read"
          else if (added > 0 && removed == 0) "append"
          else if (added > 0 && removed > 0) "rewrite"
          else if (removed > 0) "truncate"
          else if (txnDelta) "txn"
          else "noop"
        (g, op, m.files.size.toLong, added.toLong, removed.toLong,
          m.dvs.size.toLong, m.dvMarks.values.sum,
          m.checks.size.toLong, m.stats.size.toLong,
          m.txns.size.toLong, (m.colmaps.keySet ++
            m.coltypes.keySet).size.toLong)
    }
    import spark.implicits._
    rows.toDF("generation", "operation", "n_files", "files_added",
      "files_removed", "dv_files", "dv_marks", "n_checks",
      "stats_files", "txn_apps", "mapped_files")
  }
}
