package graft

import org.apache.spark.sql.Row
import java.nio.file.{Files, Paths}

/** Spreadsheet-shaped report: one CSV per workbook tab, with the
  * reference's tab names and header layouts (ref explore.py:1121-1849 —
  * the xlsx writer; sheets_data at explore.py:442-450). The engine's
  * deliverable is the data: formulas the reference leaves to Excel
  * (totals, averages, TPMo) are emitted as computed rows, and
  * presentation-only features (freeze panes, formats, textbox comments)
  * have no CSV counterpart. Side-by-side block layouts (Workload,
  * Proxihistogram) are reproduced, including the empty separator column.
  *
  * Every tab is report-sized (post-aggregation) by construction, so the
  * collects here are sink-sized, not data-sized.
  */
object DiagWorkbook {

  private def csvCell(v: Any): String = v match {
    case null => ""
    case DiagXlsx.Styled(inner, _) => csvCell(inner) // CSV carries no formats
    case s: String if s.contains(",") || s.contains("\"") ||
        s.contains("\n") || s.contains("\r") =>
      "\"" + s.replace("\"", "\"\"") + "\""
    case other => other.toString
  }

  private def writeCsv(path: String, rows: Seq[Seq[Any]]): Unit =
    Files.writeString(Paths.get(path),
      rows.map(_.map(csvCell).mkString(",")).mkString("", "\n", "\n"))

  private def get(r: Row, name: String): Any =
    if (r.isNullAt(r.fieldIndex(name))) null else r.getAs[Any](name)

  private def num(r: Row, name: String): Double =
    Option(get(r, name)).map(_.toString.toDouble).getOrElse(0.0)

  // number-format shorthands (xlsx only; the CSV writer unwraps)
  private def i0(v: Any) = DiagXlsx.Styled(v, DiagXlsx.Styles.Int0)
  private def d2(v: Any) = DiagXlsx.Styled(v, DiagXlsx.Styles.Dec2)
  private def pc(v: Any) = DiagXlsx.Styled(v, DiagXlsx.Styles.Pct2)
  private def d4(v: Any) = DiagXlsx.Styled(v, DiagXlsx.Styles.Dec4)

  /** The reference's cfstats threshold tabs: engine tab key →
    * (workbook tab name, headers) — explore.py:445-450. */
  private val ThresholdTabs = Seq(
    "dropped_mutation" -> ("Dropped Mutation",
      Seq("Node", "DC", "Keyspace", "Table", "Dropped Mutations")),
    "num_tables" -> ("Number of Tables",
      Seq("Sample Node", "DC", "Keyspace", "Table", "Total Number of Tables")),
    "large_partition" -> ("Large Partitions",
      Seq("Node", "DC", "Keyspace", "Table", "Partition Size(MB)")),
    "sstable_count" -> ("SSTable Count",
      Seq("Example Node", "DC", "Keyspace", "Table", "SSTable Count")),
    "read_latency" -> ("Read Latency",
      Seq("Node", "DC", "Keyspace", "Table", "Read Latency (ms)")),
    "write_latency" -> ("Write Latency",
      Seq("Node", "DC", "Keyspace", "Table", "Write Latency (ms)")))

  /** Write all workbook tabs as `<outDir>/workbook/<Tab Name>.csv`. */
  def write(tabs: DiagReport.Tabs, outDir: String): Unit = {
    val dir = s"$outDir/workbook"
    new java.io.File(dir).mkdirs()
    val s = sheets(tabs)
    s.foreach { case (name, rows) => writeCsv(s"$dir/$name.csv", rows) }
    // the reference's primary artifact: <db>_astra_chart.xlsx
    // (explore.py:1124) — same sheets, written as a real workbook with
    // frozen header panes (the reference's freeze_panes/freeze_row,
    // explore.py:443-450, 1129-1131; its 2-3-row freezes cover its
    // title+subheader rows — this layout has exactly one header row per
    // tab, so the pane framing maps to ySplit=1 everywhere)
    val freeze = (Seq("Workload", "Data Size", "Node Data", "Proxihistogram",
      "Tombstones", "GC Pauses") ++ ThresholdTabs.map(_._2._1))
      .map(_ -> 1).toMap
    DiagXlsx.write(s"$outDir/${tabs.clusterName}_astra_chart.xlsx", s, freeze)
  }

  /** Build every workbook tab as (name, rows), in the reference's sheet
    * order (explore.py:1127-1138). */
  private def sheets(tabs: DiagReport.Tabs): Seq[(String, Seq[Seq[Any]])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[Seq[Any]])]
    def sheet(name: String, rows: Seq[Seq[Any]]): Unit = out += (name -> rows)

    val nodeRows = tabs.nodeTable.collect()
    val wl = tabs.workload.collect().toSeq
    // numbers shared with summary.json via DiagReport.astraMetrics —
    // one definition, two deliverables
    val am = DiagReport.astraMetrics(wl, nodeRows.toSeq)

    // ---- Node Data (explore.py:443, 1545-1559: + Avg Uptime footer)
    val nodeData = nodeRows.toSeq.map(r => Seq(
      get(r, "dc"), get(r, "node"), get(r, "load"), get(r, "tokens"),
      get(r, "rack"), i0(get(r, "uptime_sec")), get(r, "uptime_human"),
      get(r, "workload"), get(r, "version")))
    if (nodeRows.nonEmpty) // exclude_tab parity: no status data, no tab
      sheet("Node Data",
        Seq(Seq("Datacenter", "Node", "Load", "Tokens", "Rack", "Uptime (sec)",
          "Uptime", "Workload", "Version")) ++ nodeData ++
          Seq(Seq("", "", "", "", "Avg Uptime", d2(am.avgUptimeSec), "", "", "")))

    // ---- Workload: read block ∥ write block (explore.py:1684-1789)
    val readSide = wl.sortBy(r => (-num(r, "reads"), r.getAs[String]("keyspace"),
      r.getAs[String]("table"))).map(r => Seq(
      get(r, "keyspace"), get(r, "table"), i0(num(r, "reads")), d4(num(r, "read_tps")),
      pc(num(r, "perc_read")), pc(num(r, "read_perc_rw"))))
    val writeSide = wl.sortBy(r => (-num(r, "writes"), r.getAs[String]("keyspace"),
      r.getAs[String]("table"))).map(r => Seq(
      get(r, "keyspace"), get(r, "table"), i0(num(r, "writes")), d4(num(r, "write_tps")),
      pc(num(r, "perc_write")), pc(num(r, "write_perc_rw"))))
    def cellNum(v: Any): Double = v match {
      case DiagXlsx.Styled(inner, _) => cellNum(inner)
      case other => other.toString.toDouble
    }
    def tot(side: Seq[Seq[Any]], i: Int) = side.map(r => cellNum(r(i))).sum
    val readTotal = Seq("Total", "", i0(tot(readSide, 2)), d4(tot(readSide, 3)), "", pc(tot(readSide, 5)))
    val writeTotal = Seq("Total", "", i0(tot(writeSide, 2)), d4(tot(writeSide, 3)), "", pc(tot(writeSide, 5)))
    val blockHdr = Seq("Keyspace", "Table")
    val wlRows =
      Seq(blockHdr ++ Seq("Read Requests", "Average TPS", "% Reads", "R % RW", "") ++
        blockHdr ++ Seq("Write Requests", "Average TPS", "% Writes", "W % RW")) ++
        (readSide :+ readTotal).zipAll(writeSide :+ writeTotal,
          Seq.fill(6)(""), Seq.fill(6)("")).map { case (a, b) => a ++ Seq("") ++ b }
    sheet("Workload", wlRows)

    // ---- Data Size (explore.py:1130, 1710-1716) + Total footer
    val dsRows = wl.sortBy(r => (-num(r, "size_bytes"), r.getAs[String]("keyspace"),
      r.getAs[String]("table"))).map(r =>
      Seq(get(r, "keyspace"), get(r, "table"), i0(num(r, "size_bytes"))))
    sheet("Data Size",
      Seq(Seq("Keyspace", "Table", "Size (Bytes)")) ++ dsRows ++
        Seq(Seq("Total", "", i0(wl.map(num(_, "size_bytes")).sum))))

    // ---- threshold tabs (explore.py:445-450)
    val th = tabs.thresholds.collect().groupBy(_.getAs[String]("tab"))
    ThresholdTabs.foreach { case (key, (tabName, headers)) =>
      // 2-dp for ms/MB values, thousands format for counts
      val fmt: Any => Any =
        if (key == "read_latency" || key == "write_latency" || key == "large_partition") d2
        else i0
      val rows = th.getOrElse(key, Array.empty[Row]).toSeq.map(r => Seq(
        get(r, "node"), get(r, "dc"), get(r, "keyspace"), get(r, "table"),
        fmt(num(r, "value"))))
      sheet(tabName, headers.map(_.asInstanceOf[Any]) +: rows)
    }

    // ---- Tombstones (explore.py:1575-1600; ts_cols order)
    val tsRows = tabs.tombstones.collect().toSeq.map(r => Seq(
      get(r, "dc"), get(r, "node"), get(r, "keyspace"), get(r, "table"),
      i0(get(r, "reads")), i0(get(r, "tombstones"))))
    sheet("Tombstones",
      Seq(Seq("Sample DC", "Sample Node", "Keyspace", "Table",
        "Live Rows Read", "Tombstones")) ++ tsRows)

    // ---- GC Pauses (explore.py:1605-1682). The reference writes the
    // node's DC in column 2 for node rows; the engine's gc relation
    // carries the rollup level there (documented deviation).
    val gcRows = tabs.gc.collect().toSeq.map(r => Seq(
      get(r, "name"), get(r, "level"), get(r, "pauses"), get(r, "max_ms"),
      get(r, "p99"), get(r, "p98"), get(r, "p95"), get(r, "p90"),
      get(r, "p75"), get(r, "p50"), get(r, "min_ms"),
      get(r, "oldest"), get(r, "newest"), get(r, "ts_of_max")))
    sheet("GC Pauses",
      Seq(Seq("Name", "Level/DC", "Pauses", "Max", "P99", "P98", "P95",
        "P90", "P75", "P50", "Min", "From", "To", "Max Date")) ++ gcRows)

    // ---- Proxihistogram: read block ∥ write block (explore.py:444)
    val phLabels = Seq("Max", "99", "98", "95", "75", "50", "Min")
    val phRows = tabs.proxyHist.collect().toSeq.map { r =>
      val ids = Seq(get(r, "dc"), get(r, "node"))
      ids ++ phLabels.map(l => d2(get(r, s"r_$l"))) ++ Seq("") ++
        ids ++ phLabels.map(l => d2(get(r, s"w_$l")))
    }
    val phHdr = Seq("Datacenter", "Node", "Max", "P99", "P98", "P95", "P75", "P50", "Min")
    sheet("Proxihistogram", (phHdr ++ Seq("") ++ phHdr) +: phRows)

    // ---- Astra Metrics: workload summary + warning sections
    // (explore.py:1801-1846)
    val warnRows = tabs.warnings.collect().toSeq
    val warnSection =
      if (warnRows.isEmpty) Seq(Seq("No potential guardrail issues identified"))
      else warnRows.groupBy(_.getAs[String]("category")).toSeq.sortBy(_._1)
        .flatMap { case (cat, rs) =>
          Seq(Seq(""), Seq(cat)) ++
            rs.groupBy(_.getAs[String]("check")).toSeq.sortBy(_._1)
              .flatMap { case (check, ms) =>
                Seq(check).map(Seq[Any](_)) ++
                  ms.map(_.getAs[String]("message")).sorted.map(m => Seq[Any]("", m))
              }
        }
    sheet("Astra Metrics",
      Seq(
        Seq(s"Astra Metrics Data for ${tabs.clusterName}"),
        Seq("Workload Summary"),
        Seq("Read TPS", d4(am.readTps)),
        Seq("Read TPMo", i0(am.readTpmo)),
        Seq("Write TPS", d4(am.writeTps)),
        Seq("Write TPMo", i0(am.writeTpmo)),
        Seq("Data Size (GB)", d2(am.dataSizeGb)),
        Seq("Average Uptime", d2(am.avgUptimeSec))) ++ warnSection)

    // reference sheet order: Astra Metrics, Workload, Data Size, the
    // sheets_data tabs, Tombstones, GC Pauses (explore.py:1127-1138)
    val order = Seq("Astra Metrics", "Workload", "Data Size", "Node Data",
      "Proxihistogram") ++ ThresholdTabs.map(_._2._1) ++
      Seq("Tombstones", "GC Pauses")
    val byName = out.toMap
    order.flatMap(n => byName.get(n).map(n -> _))
  }
}
