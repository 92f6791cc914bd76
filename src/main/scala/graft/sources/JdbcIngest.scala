package graft.sources

import org.apache.spark.sql.functions._
import graft.storage.VersionedTable

/** Incremental ingestion from a JDBC warehouse into a versioned table —
  * the reference's high-watermark load pattern (scripts/raw data loading
  * and stream creation/incremental_raw_co2data.py: only new years load;
  * co2_harmonized_sp watermark filter) re-expressed against the S14 JDBC
  * source with engine-native exactly-once:
  *
  *  - the DELTA is selected server-side ([[JdbcWarehouse.readIncremental]]
  *    pushes `watermarkCol > lastSeen` into the remote scan), so each pull
  *    transfers only new rows — never the table;
  *  - the new high watermark rides the SAME commit as the data
  *    (`offsets` in [[VersionedTable]]), with a commit-time guard, so a
  *    crashed/replayed pull can never double-land a batch and a pull that
  *    loses a commit race re-evaluates against fresh state;
  *  - the watermark probe is one server-side MAX — a pull with nothing
  *    new costs one 1-row query and zero commits.
  *
  * 100 TB design: the delta read fans out over `parts` range-partitioned
  * connections when the caller expects large batches; the bounded-window
  * filter still pushes down, and the commit is one atomic append of the
  * partitioned scan.
  */
object JdbcIngest {

  /** Offsets key for a (table, watermark column) feed. */
  def streamId(srcTable: String, watermarkCol: String): String =
    s"jdbc/$srcTable/$watermarkCol"

  /** One incremental pull. Reads rows of `srcTable` with `watermarkCol`
    * strictly above the target's recorded offset (everything on first
    * pull), appends them to `target` with the new watermark in the same
    * commit, and returns the number of rows ingested (0 when the source
    * has nothing new — no commit happens).
    *
    * The watermark column must be integral (key / epoch / version);
    * `parts > 1` splits the delta read over that many range-partitioned
    * connections.
    */
  def pull(wh: JdbcWarehouse, srcTable: String, watermarkCol: String,
           target: VersionedTable, parts: Int = 1): Long = {
    val sid = streamId(srcTable, watermarkCol)
    val last = target.offsets.get(sid)
    val hw = wh.maxWatermark(srcTable, watermarkCol)
      .map { case n: Number => n.longValue
             case other => sys.error(s"non-integral watermark $other") }
    hw match {
      case None => 0L // empty source
      case Some(h) if last.exists(_ >= h) => 0L // nothing new
      case Some(h) =>
        val lo = last.getOrElse(Long.MinValue)
        val base =
          if (parts <= 1 || lo == Long.MinValue) wh.readTable(srcTable)
          else wh.readTablePartitioned(srcTable, watermarkCol, lo + 1, h, parts)
        // the bounded window (lo, h] pushes into the remote scan; the
        // upper bound makes a pull deterministic even while the source
        // keeps growing
        val delta = base.filter(
          col(watermarkCol) > lit(lo) && col(watermarkCol) <= lit(h))
        // the row count is probed SERVER-side (one 1-row query) instead
        // of delta.count(): a JDBC DataFrame re-runs the remote query on
        // every action, so counting the Spark-side relation would
        // transfer the whole delta twice per pull. The window (lo, h] is
        // immutable under the monotone-watermark premise, so the probe
        // and the landed batch agree.
        val wq = wh.quoteCol(watermarkCol)
        val wpred = // Long.MinValue is not a portable SQL literal
          if (lo == Long.MinValue) s"$wq <= $h"
          else s"$wq > $lo AND $wq <= $h"
        val n = wh.readQuery(
          s"SELECT COUNT(*) AS N FROM ${wh.qualify(srcTable)} WHERE $wpred")
          .head().get(0).asInstanceOf[Number].longValue()
        if (n == 0) 0L
        // compare-and-set commit: lands IFF the recorded offset still
        // equals the `lo` this window was read against. A monotone
        // (`< h`) guard would let two overlapping concurrent pulls both
        // land — (w, h1] then (w, h2] with h2 > h1 double-ingests
        // (w, h1]. Equality makes the loser a clean no-op.
        else if (target.appendIfOffsetIs(delta, sid, last, h)) n
        else 0L // lost the race: another pull landed this window
    }
  }
}
