package graft.sources

import java.time.{Instant, LocalDate}

import org.apache.spark.sql.Column
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
  * Watermark columns may be integral (key / epoch / version), DATE, or
  * TIMESTAMP — the reference's own watermark is a DATE
  * (`loading_data_sp/function.py:41-52`: `MAX(TO_DATE(...))`). Offsets
  * store an order-preserving integral encoding (value / epoch day /
  * epoch micros), so the CAS exactly-once contract is identical across
  * the three types. Precision contract: fractional numeric watermarks
  * are rejected loudly (truncation could skip rows forever), and
  * TIMESTAMP watermarks are treated at MICROsecond granularity — a
  * column carrying meaningful sub-microsecond precision (e.g. Derby
  * TIMESTAMP(9)) can leave rows above the micros-truncated max
  * permanently unpulled and should watermark on an integral epoch
  * column instead.
  *
  * 100 TB design: the delta read fans out over `parts` range-partitioned
  * connections when the caller expects large batches (including the
  * first, biggest pull — its lower bound comes from one server-side
  * MIN); the bounded-window filter still pushes down, and the commit is
  * one atomic append of the partitioned scan.
  */
object JdbcIngest {

  /** Offsets key for a (table, watermark column) feed. */
  def streamId(srcTable: String, watermarkCol: String): String =
    s"jdbc/$srcTable/$watermarkCol"

  /** Order-preserving Long encoding of a watermark value, plus the typed
    * literal forms the two predicate sites need: a Spark `Column` literal
    * (pushes into the remote scan) and a server-side SQL literal (the
    * window-count probe). Date/timestamp SQL literals use JDBC escape
    * syntax (`{d '…'}` / `{ts '…'}`) — drivers rewrite it into their own
    * dialect, so the probe is portable.
    */
  private sealed trait WmCodec {
    def enc(v: Any): Long
    def sparkLit(l: Long): Column
    def sqlLit(l: Long): String
    /** Partition bound for [[JdbcWarehouse.readTablePartitioned]]. */
    def boundStr(l: Long): String
    /** Whether Spark's JDBC stride partitioner accepts the column type
      * ("numeric, date, or timestamp"); types it rejects (TIMESTAMP_NTZ)
      * fan out via explicit slice predicates instead.
      */
    def stridePartitionable: Boolean = true
  }

  private object IntegralWm extends WmCodec {
    // fractional numerics are REJECTED, not truncated: flooring the
    // server-side MAX shrinks the window's upper bound, so rows between
    // floor(max) and max are excluded by the pushed-down filter and — on
    // a quiescent source — never ingest on any later pull either
    def enc(v: Any): Long = v match {
      case b: java.math.BigDecimal =>
        try b.longValueExact
        catch { case _: ArithmeticException => fractional(v) }
      case d @ (_: java.lang.Double | _: java.lang.Float) =>
        val x = d.asInstanceOf[Number].doubleValue
        if (x != math.floor(x) || x.isInfinite ||
            math.abs(x) > 9.007199254740992e15) fractional(v) // 2^53
        else x.toLong
      case n: Number => n.longValue
    }
    private def fractional(v: Any): Nothing = sys.error(
      s"non-integral numeric watermark $v: truncating it can permanently " +
        "skip rows — use an integral, DATE or TIMESTAMP watermark column")
    def sparkLit(l: Long): Column = lit(l)
    def sqlLit(l: Long): String = l.toString
    def boundStr(l: Long): String = l.toString
  }

  private object DateWm extends WmCodec { // epoch day
    def enc(v: Any): Long = v match {
      case d: java.sql.Date => d.toLocalDate.toEpochDay
      case d: LocalDate => d.toEpochDay // java8 datetime API mode
    }
    private def date(l: Long) = java.sql.Date.valueOf(LocalDate.ofEpochDay(l))
    def sparkLit(l: Long): Column = lit(date(l))
    def sqlLit(l: Long): String = s"{d '${date(l)}'}"
    def boundStr(l: Long): String = date(l).toString
  }

  private object TimestampWm extends WmCodec { // epoch micros
    def enc(v: Any): Long = {
      val i = v match {
        case t: java.sql.Timestamp => t.toInstant
        case i: Instant => i
      }
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    private def ts(l: Long) = java.sql.Timestamp.from(
      Instant.ofEpochSecond(Math.floorDiv(l, 1000000L),
        Math.floorMod(l, 1000000L) * 1000L))
    def sparkLit(l: Long): Column = lit(ts(l))
    def sqlLit(l: Long): String = s"{ts '${ts(l)}'}"
    def boundStr(l: Long): String = ts(l).toString
  }

  private object NtzWm extends WmCodec { // epoch micros, zone-free
    def enc(v: Any): Long = {
      val i = v.asInstanceOf[java.time.LocalDateTime]
        .toInstant(java.time.ZoneOffset.UTC)
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    private def ldt(l: Long) = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(l, 1000000L),
      (Math.floorMod(l, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
    def sparkLit(l: Long): Column = lit(ldt(l)) // TIMESTAMP_NTZ literal
    def sqlLit(l: Long): String =
      s"{ts '${java.sql.Timestamp.valueOf(ldt(l))}'}"
    def boundStr(l: Long): String =
      java.sql.Timestamp.valueOf(ldt(l)).toString
    override def stridePartitionable: Boolean = false
  }

  private def codecFor(v: Any): WmCodec = v match {
    case _: Number => IntegralWm
    case _: java.sql.Date | _: LocalDate => DateWm
    case _: java.sql.Timestamp | _: Instant => TimestampWm
    case _: java.time.LocalDateTime => NtzWm // TIMESTAMP_NTZ column
    case other => sys.error(
      s"unsupported watermark type ${other.getClass.getName} " +
        "(integral, DATE and TIMESTAMP are supported)")
  }

  /** One incremental pull. Reads rows of `srcTable` with `watermarkCol`
    * strictly above the target's recorded offset (everything on first
    * pull), appends them to `target` with the new watermark in the same
    * commit, and returns the number of rows ingested (0 when the source
    * has nothing new — no commit happens).
    *
    * `parts > 1` splits the delta read over that many range-partitioned
    * connections.
    */
  def pull(wh: JdbcWarehouse, srcTable: String, watermarkCol: String,
           target: VersionedTable, parts: Int = 1): Long = {
    val sid = streamId(srcTable, watermarkCol)
    val last = target.offsets.get(sid)
    val hwRaw = wh.maxWatermark(srcTable, watermarkCol)
    hwRaw match {
      case None => 0L // empty source
      case Some(raw) =>
        val codec = codecFor(raw)
        val h = codec.enc(raw)
        if (last.exists(_ >= h)) return 0L // nothing new
        // the bounded window pushes into the remote scan; the upper bound
        // makes a pull deterministic even while the source keeps growing.
        // On the FIRST pull there is no lower bound at all — the Spark
        // filter and the server-side probe below must select the SAME
        // window, so both drop it rather than approximating it with a
        // sentinel.
        val upper = col(watermarkCol) <= codec.sparkLit(h)
        val window = last match {
          case Some(lo) => col(watermarkCol) > codec.sparkLit(lo) && upper
          case None => upper
        }
        val base =
          if (parts <= 1) wh.readTable(srcTable)
          else {
            // partition bounds only set the stride (edge partitions are
            // open), so the first pull can fan out too: one server-side
            // MIN supplies its lower bound
            val lo = last.orElse(
              wh.readQuery(s"SELECT MIN(${wh.quoteCol(watermarkCol)}) AS lw " +
                  s"FROM ${wh.qualify(srcTable)}")
                .collect().headOption.flatMap(r => Option(r.get(0)))
                .map(codec.enc))
            lo match {
              case Some(l) if l < h && codec.stridePartitionable =>
                wh.readTablePartitioned(
                  srcTable, watermarkCol, codec.boundStr(l), codec.boundStr(h), parts)
              case Some(l) if l < h =>
                // explicit disjoint slice predicates (TIMESTAMP_NTZ —
                // Spark's stride partitioner rejects the type). Slice 0
                // is lower-open on the first pull: `l` is then the
                // server-side MIN, which itself must ingest.
                val wq = wh.quoteCol(watermarkCol)
                val cuts = (0 to parts).map(i => l + (h - l) * i / parts)
                val preds = cuts.sliding(2).zipWithIndex.map {
                  case (Seq(a, b), i) =>
                    val hi = s"$wq <= ${codec.sqlLit(b)}"
                    if (i == 0 && last.isEmpty) hi
                    else s"$wq > ${codec.sqlLit(a)} AND $hi"
                }.toSeq
                wh.readTablePredicates(srcTable, preds)
              case _ => wh.readTable(srcTable) // degenerate 1-value window
            }
          }
        val delta = base.filter(window)
        // the row count is probed SERVER-side (one 1-row query) instead
        // of delta.count(): a JDBC DataFrame re-runs the remote query on
        // every action, so counting the Spark-side relation would
        // transfer the whole delta twice per pull. The window is
        // immutable under the monotone-watermark premise, so the probe
        // and the landed batch agree — and its predicate mirrors
        // `window` exactly, including the first-pull no-lower-bound case.
        val wq = wh.quoteCol(watermarkCol)
        val wpred = last match {
          case Some(lo) => s"$wq > ${codec.sqlLit(lo)} AND $wq <= ${codec.sqlLit(h)}"
          case None => s"$wq <= ${codec.sqlLit(h)}"
        }
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
