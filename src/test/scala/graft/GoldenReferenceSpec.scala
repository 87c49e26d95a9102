package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import scala.sys.process.{Process, ProcessLogger}

/** Golden cross-validation against the ACTUAL reference program
  * (/root/reference/explore.py), not a re-reading of its source: run it
  * on the diag_mini fixture through a recording xlsxwriter shim
  * (tools/xlsxwriter_shim), then diff its summary.json and workbook cell
  * dump against this engine's output key-by-key.
  *
  * Parity keys must match exactly; every known intent deviation is
  * PINNED as an explicit assertion on BOTH sides, so silent drift in
  * either direction fails the build:
  *   - `.append =` bug → reference keeps only the last UDF/UDA, garbled
  *     by its tokenization (explore.py:817-838); engine collects all.
  *   - MV source attribution → reference tokenizes the SELECT clause
  *     ("*.users", explore.py:853-855); engine resolves the real table.
  *   - inline-PK column undercount → reference's field dict skips a
  *     `x type PRIMARY KEY` line (explore.py:858-869); engine counts it.
  *   - AdditionalLogs gating → reference reads ./AdditionalLogs relative
  *     to CWD and only for dash-named node dirs (explore.py:1049-1066);
  *     engine ingests the side-channel for every node.
  *   - GC percentile position → reference picks round(n·q)-1 with
  *     banker's rounding (explore.py:365-376); engine HALF_UP(n·q).
  *   - tablestats-only node → reference pass 2 crashes (explore.py:1425
  *     has no cfstats→tablestats fallback, unlike :901-903); engine
  *     falls back in both passes.
  *
  * Skipped (canceled) when python3 or the reference checkout is absent.
  */
class GoldenReferenceSpec extends AnyFunSuite with SparkTestBase {

  private val refScript = Paths.get("/root/reference/explore.py")
  private val shimDir = Paths.get("tools/xlsxwriter_shim").toAbsolutePath
  private val mapper = new ObjectMapper()

  private def python3: Option[String] =
    Seq("python3").find { p =>
      try Process(Seq(p, "--version")).!(ProcessLogger(_ => ())) == 0
      catch { case _: Exception => false }
    }

  private def requireEnv(): String = {
    assume(Files.exists(refScript), "reference checkout not present")
    val py = python3
    assume(py.isDefined, "python3 not on PATH")
    py.get
  }

  private def copyTree(src: Path, dst: Path): Unit =
    Files.walk(src).iterator().asScala.foreach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    }

  /** Copy the fixture and give tablestats-only nodes a cfstats twin so
    * the reference's fallback-less pass 2 can run (pinned separately in
    * the crash test). */
  private def materializeFixture(): Path = {
    val root = Files.createTempDirectory("graft_golden")
    copyTree(Paths.get("src/test/resources/diag_mini"), root)
    Files.list(root.resolve("nodes")).iterator().asScala.foreach { nd =>
      val ts = nd.resolve("nodetool/tablestats")
      val cf = nd.resolve("nodetool/cfstats")
      if (Files.exists(ts) && !Files.exists(cf)) Files.copy(ts, cf)
    }
    root
  }

  private def runReference(py: String, fixture: Path): Int =
    Process(
      Seq(py, refScript.toString, "-p", fixture.toString),
      cwd = fixture.toFile,
      "PYTHONPATH" -> shimDir.toString
    ).!(ProcessLogger(_ => (), _ => ()))

  // one shared run of both programs on one fixture tree
  private lazy val golden: (JsonNode, JsonNode, JsonNode) = {
    val py = requireEnv()
    val fixture = materializeFixture()
    assert(runReference(py, fixture) == 0, "reference program failed")
    val ref = mapper.readTree(Files.readString(fixture.resolve("summary.json")))
    val cells = mapper.readTree(Files.readString(
      fixture.resolve("TestCluster_astra_chart.xlsx.celldump.json")))
    val ours = mapper.readTree(
      DiagReport.summaryJson(DiagReport.analyze(spark, fixture.toString)))
    (ref, cells, ours)
  }

  /** Deep diff; numbers compare with relative tolerance, arrays as
    * sorted string multisets. Returns human-readable diff lines. */
  private def diff(a: JsonNode, b: JsonNode, path: String = ""): Seq[String] =
    if (a.isObject && b.isObject) {
      val keys = (a.fieldNames.asScala ++ b.fieldNames.asScala).toSeq.distinct
      keys.flatMap { k =>
        if (!a.has(k)) Seq(s"only-right $path/$k")
        else if (!b.has(k)) Seq(s"only-left $path/$k")
        else diff(a.get(k), b.get(k), s"$path/$k")
      }
    } else if (a.isArray && b.isArray) {
      val l = a.elements.asScala.map(_.toString).toSeq.sorted
      val r = b.elements.asScala.map(_.toString).toSeq.sorted
      if (l != r) Seq(s"array-diff $path left=$l right=$r") else Nil
    } else if (a.isNumber && b.isNumber) {
      val (x, y) = (a.doubleValue, b.doubleValue)
      if (math.abs(x - y) > 1e-9 * math.max(1.0, math.max(math.abs(x), math.abs(y))))
        Seq(s"num-diff $path left=$x right=$y")
      else Nil
    } else if (a.asText != b.asText) Seq(s"val-diff $path left=$a right=$b")
    else Nil

  test("workload, dataset_size, missing_data, avg_uptime: exact parity") {
    val (ref, _, ours) = golden
    for (key <- Seq("workload", "dataset_size"))
      assert(diff(ref.get(key), ours.get(key), key).isEmpty,
        diff(ref.get(key), ours.get(key), key).mkString("\n"))
    assert(ref.get("missing_data").asInt == ours.get("missing_data").asInt)
    // avg_uptime matches on THIS fixture but the semantics differ:
    // reference = Σuptime(diag nodes)/(diag nodes+1) (row-cursor
    // off-by-one, explore.py:1553-1563: 259200/5); engine =
    // Σuptime(all status nodes, down=0)/count (259200/5). A fixture
    // with ≠1 down node would separate them — that asymmetry is the pin.
    assert(ref.get("avg_uptime").asDouble == 51840.0)
    assert(ours.get("avg_uptime").asDouble == 51840.0)
  }

  test("warnings: exact parity on every well-formed check") {
    val (ref, _, ours) = golden
    val sane = Seq(
      ("Astra Guardrails", "Secondary Indexes"),
      ("Astra Guardrails", "Storage-Attached Indexes"), // both empty []
      ("Astra Guardrails", "Number of Tables"),
      ("Astra Guardrails", "Large Partitions"),
      ("Database Health", "Tombstones"),
      ("Database Health", "SSTable Count"),
      ("Database Health", "Read Latency"),
      ("Database Health", "Dropped Mutation"),
      ("Missing Data", "Missing Node Data"),
      ("Workload", "Not Supported"))
    for ((cat, check) <- sane) {
      val l = ref.get("warnings").get(cat).get(check)
      val r = ours.get("warnings").get(cat).get(check)
      assert(l != null && r != null, s"$cat/$check missing")
      assert(diff(l, r, s"$cat/$check").isEmpty,
        diff(l, r, s"$cat/$check").mkString("\n"))
    }
    // neither side invents extra checks beyond the pinned set
    val pinnedOursOnly = Set("GC Pauses")
    val refChecks = ref.get("warnings").fieldNames.asScala.flatMap(c =>
      ref.get("warnings").get(c).fieldNames.asScala.map((c, _))).toSet
    val ourChecks = ours.get("warnings").fieldNames.asScala.flatMap(c =>
      ours.get("warnings").get(c).fieldNames.asScala.map((c, _))).toSet
    assert((ourChecks -- refChecks).map(_._2) == pinnedOursOnly)
    assert((refChecks -- ourChecks).isEmpty)
  }

  test("pinned: MV source attribution — reference tokenizes the SELECT clause") {
    val (ref, _, ours) = golden
    val refMv = ref.get("warnings").get("Astra Guardrails")
      .get("Materialized Views").elements.asScala.map(_.asText).toSeq
    val ourMv = ours.get("warnings").get("Astra Guardrails")
      .get("Materialized Views").elements.asScala.map(_.asText).toSeq
    // src_ks = line.split('.')[0].split()[1] over "SELECT * FROM ks1.users"
    // yields "*" (explore.py:853); the engine resolves the real base table
    assert(refMv == Seq("3 Materialized Views of *.users***"))
    assert(ourMv == Seq("3 Materialized Views of ks1.users***"))
  }

  test("pinned: UDF/UDA `.append =` last-wins + tokenization garble") {
    val (ref, _, ours) = golden
    def warn(n: JsonNode, check: String) = n.get("warnings")
      .get("Astra Guardrails").get(check).elements.asScala.map(_.asText).toSeq
    // assigning to list.append raises → except replaces the list, so only
    // the LAST function survives; tbl token for "CREATE OR REPLACE
    // FUNCTION ks1.maxof(a int,..." is "ks1.maxof(a" and the ks context
    // is whatever CREATE KEYSPACE came last (ks2) — explore.py:821-838
    assert(warn(ref, "User-Defined Function") == Seq("UDF ks1.maxof(a in ks2"))
    // "CREATE AGGREGATE IF NOT EXISTS ..." special-case grabs token [2]
    // = "IF" (explore.py:811-814)
    assert(warn(ref, "User-Defined Aggregate") == Seq("UDA IF in ks2"))
    // engine: collect-all with real names and defining keyspace
    assert(warn(ours, "User-Defined Function").sorted ==
      Seq("UDF avgstate in ks1", "UDF maxof in ks1"))
    assert(warn(ours, "User-Defined Aggregate") == Seq("UDA average in ks1"))
  }

  test("pinned: inline-PK column undercount") {
    val (ref, _, ours) = golden
    def cols(n: JsonNode) = n.get("warnings").get("Astra Guardrails")
      .get("Number of Columns").elements.asScala.map(_.asText).toSeq
    // "id uuid PRIMARY KEY," routes to the PRIMARY KEY branch and never
    // reaches the field dict (explore.py:858-869) → 51; the DDL declares
    // 52 columns and the engine counts them all
    assert(cols(ref) == Seq("51 columns in ks2.legacy_cf"))
    assert(cols(ours) == Seq("52 columns in ks2.legacy_cf"))
  }

  test("pinned: GC event set, percentile position, and the 10001 node bug") {
    val (_, cells, ours) = golden
    val gc = cells.get("GC Pauses")
    def row(i: Int)(c: Int): JsonNode = gc.get(s"$i,$c")
    // reference Database row: 5 pauses — the AdditionalLogs event (1000ms)
    // is skipped because ./AdditionalLogs resolves against CWD and the
    // node-dir gate wants dash-separated IPs (explore.py:1049-1060);
    // values are [100,210,300,450,600] and P50 = pos round(2.5)-1 = 1
    // (banker's) → 210, P99 = pos round(4.95)-1 = 4 → 600 ≤ tp_gcp 800,
    // which is why the reference emits NO GC-pause warning
    assert(row(1)(1).asText == "Database")
    assert(row(1)(2).asInt == 5)
    assert(row(1)(9).asInt == 210)  // P50
    assert(row(1)(4).asInt == 600)  // P99
    // reference writes node dir "10_0_0_1" through int() — Python reads
    // underscores as digit separators → 10001 (explore.py:415)
    assert(row(4)(0).asInt == 10001)
    // engine: 6 events (AdditionalLogs ingested for every node), HALF_UP
    // position → P50 = idx 3 of [100,210,300,450,600,1000] = 300, and
    // P99 = 1000 > 800 fires the warning the reference misses
    val db = tabs_gc_database()
    assert(db.getAs[Long]("pauses") == 6)
    assert(db.getAs[Int]("p50") == 300)
    assert(db.getAs[Int]("p99") == 1000)
    assert(ours.get("warnings").get("Database Health").get("GC Pauses")
      .get(0).asText == "P99 GC pause greater than 800")
  }

  private def tabs_gc_database(): org.apache.spark.sql.Row =
    DiagReport.analyze(spark, "src/test/resources/diag_mini").gc
      .filter("level = 'Database'").head()

  test("workbook: reference Workload-tab data cells equal the engine's workload tab") {
    val (_, cells, _) = golden
    val wlSheet = cells.get("Workload")
    // reference layout: title row 0, block header row 1, column header
    // row 2, data from row 3 (read block cols 0-5); rows sorted by read
    // count desc (distinct counts in this fixture → total order)
    def cell(r: Int, c: Int): Option[JsonNode] = Option(wlSheet.get(s"$r,$c"))
    val refRows = Iterator.from(3)
      .map(r => (r, cell(r, 0)))
      .takeWhile { case (_, v) => v.exists(v => v.asText != "Total" && v.asText.nonEmpty) }
      .map { case (r, _) =>
        (cell(r, 0).get.asText, cell(r, 1).get.asText, cell(r, 2).get.asDouble,
          cell(r, 3).get.asDouble, cell(r, 4).get.asDouble, cell(r, 5).get.asDouble)
      }.toSeq
    assert(refRows.nonEmpty)
    val ours = DiagReport.analyze(spark, "src/test/resources/diag_mini")
      .workload.collect()
      .filter(r => Option(r.getAs[Any]("reads")).isDefined)
      .sortBy(r => -r.getAs[Double]("reads"))
      .map(r => (r.getAs[String]("keyspace"), r.getAs[String]("table"),
        r.getAs[Double]("reads"), r.getAs[Double]("read_tps"),
        r.getAs[Double]("perc_read"), r.getAs[Double]("read_perc_rw"))).toSeq
    assert(refRows.length == ours.length,
      s"row count: ref=${refRows.length} ours=${ours.length}")
    refRows.zip(ours).foreach { case (a, b) =>
      assert(a._1 == b._1 && a._2 == b._2, s"key order: $a vs $b")
      Seq((a._3, b._3), (a._4, b._4), (a._5, b._5), (a._6, b._6)).foreach {
        case (x, y) => assert(math.abs(x - y) < 1e-9, s"value: $a vs $b")
      }
    }
  }

  test("workbook: reference Workload WRITE-block cells equal the engine's write side") {
    val (_, cells, _) = golden
    val wlSheet = cells.get("Workload")
    // write block: cols 7-12 from row 3 (explore.py:1765-1790); a table
    // with no write counter (the read-only index keyspace) must NOT
    // appear — the reference's write_count list has no entry for it
    def cell(r: Int, c: Int): Option[JsonNode] = Option(wlSheet.get(s"$r,$c"))
    val refRows = Iterator.from(3)
      .map(r => (r, cell(r, 7)))
      .takeWhile { case (_, v) => v.exists(v => v.asText != "Total" && v.asText.nonEmpty) }
      .map { case (r, _) =>
        (cell(r, 7).get.asText, cell(r, 8).get.asText, cell(r, 9).get.asDouble,
          cell(r, 10).get.asDouble, cell(r, 11).get.asDouble, cell(r, 12).get.asDouble)
      }.toSeq
    assert(refRows.nonEmpty)
    val ours = DiagReport.analyze(spark, "src/test/resources/diag_mini")
      .workload.collect()
      .filter(r => Option(r.getAs[Any]("writes")).isDefined)
      .sortBy(r => -r.getAs[Double]("writes"))
      .map(r => (r.getAs[String]("keyspace"), r.getAs[String]("table"),
        r.getAs[Double]("writes"), r.getAs[Double]("write_tps"),
        r.getAs[Double]("perc_write"), r.getAs[Double]("write_perc_rw"))).toSeq
    assert(refRows.length == ours.length,
      s"row count: ref=${refRows.length} ours=${ours.length}")
    refRows.zip(ours).foreach { case (a, b) =>
      assert(a._1 == b._1 && a._2 == b._2, s"key order: $a vs $b")
      Seq((a._3, b._3), (a._4, b._4), (a._5, b._5), (a._6, b._6)).foreach {
        case (x, y) => assert(math.abs(x - y) < 1e-9, s"value: $a vs $b")
      }
    }
    // and the read-only index table really is the delta between sides
    val readKeys = DiagReport.analyze(spark, "src/test/resources/diag_mini")
      .workload.collect().filter(r => Option(r.getAs[Any]("reads")).isDefined)
      .map(r => (r.getAs[String]("keyspace"), r.getAs[String]("table"))).toSet
    val writeKeys = ours.map(t => (t._1, t._2)).toSet
    assert((readKeys -- writeKeys).contains(("ks2", "users_by_email_idx")))
  }

  test("workbook: reference Tombstones-tab cells equal the engine's tab (node-dir pinned)") {
    val (_, cells, _) = golden
    val sheet = cells.get("Tombstones")
    // layout (explore.py:1575-1600): header row 0, data rows from 1 —
    // (Sample DC, Sample Node, Keyspace, Table, Live Rows Read, Tombstones)
    def cell(r: Int, c: Int): Option[JsonNode] = Option(sheet.get(s"$r,$c"))
    val refRows = Iterator.from(1)
      .map(r => (r, cell(r, 0)))
      .takeWhile(_._2.exists(_.asText.nonEmpty))
      .map { case (r, _) =>
        (cell(r, 0).get.asText, cell(r, 1).get.asText, cell(r, 2).get.asText,
          cell(r, 3).get.asText, cell(r, 4).get.asLong, cell(r, 5).get.asLong)
      }.toSeq
    assert(refRows.nonEmpty)
    val ours = DiagReport.analyze(spark, "src/test/resources/diag_mini")
      .tombstones.collect().map(r =>
        (r.getAs[String]("dc"),
          // pinned difference: the reference prints the raw node DIR
          // ("10_0_0_1", explore.py:357 keeps n as read from disk); the
          // engine resolves dirs to the status IP (J1) — same identity
          r.getAs[String]("node").replace('.', '_'),
          r.getAs[String]("keyspace"), r.getAs[String]("table"),
          r.getAs[Long]("reads"), r.getAs[Long]("tombstones"))).toSeq
    // pinned reference bug, now artifact-level: explore.py:343 matches
    // 'lives rows and' (typo) — the standard "live rows and" phrasing
    // parses as ts_tombstones=0 and is dropped by the tp_ts gate, so the
    // reference keeps ONLY the "live and" phrasing (ks2.legacy_cf here).
    // The engine reads both phrasings (Parsers.scala parseLog, S10), so
    // it additionally reports ks1.users (2000 > 1000); ks1.orders (500)
    // is below the gate on both sides.
    assert(refRows == Seq(("dc1", "10_0_0_1", "ks2", "legacy_cf", 55L, 5000L)))
    assert(ours == refRows :+ ("dc1", "10_0_0_1", "ks1", "users", 10L, 2000L))
  }

  test("workbook: reference Proxihistogram cells equal the engine's pivot (µs→ms)") {
    val (_, cells, _) = golden
    val sheet = cells.get("Proxihistogram")
    def cell(r: Int, c: Int): Option[JsonNode] = Option(sheet.get(s"$r,$c"))
    // the 10_0_0_1 dir goes through int() → the NUMBER 10001 (the same
    // pinned rendering bug as the GC tab); other nodes stay strings.
    // Normalize both separators: the engine's proxy tab keeps the raw
    // dir form ("10_0_0_1") where the reference also starts from dirs
    def nodeKey(n: JsonNode): String =
      if (n.isNumber) n.asLong.toString else n.asText.replace(".", "").replace("_", "")
    // layout: title 0, header 1, data from 2; read block cols 0-8,
    // empty separator col 9, write block cols 10-18
    val refRows = Iterator.from(2).map(r => (r, cell(r, 0)))
      .takeWhile(_._2.exists(_.asText.nonEmpty))
      .map { case (r, _) =>
        ((cell(r, 0).get.asText, nodeKey(cell(r, 1).get)),
          ((2 to 8).map(c => cell(r, c).get.asDouble),
            (12 to 18).map(c => cell(r, c).get.asDouble)))
      }.toMap
    assert(refRows.size == 4)
    val labels = Seq("Max", "99", "98", "95", "75", "50", "Min")
    val ours = DiagReport.analyze(spark, "src/test/resources/diag_mini")
      .proxyHist.collect().map { r =>
        ((r.getAs[String]("dc"), r.getAs[String]("node").replace(".", "").replace("_", "")),
          (labels.map(l => r.getAs[Double](s"r_$l")),
            labels.map(l => r.getAs[Double](s"w_$l"))))
      }.toMap
    assert(ours.keySet == refRows.keySet)
    for (k <- refRows.keySet) {
      val ((rr, rw), (or, ow)) = (refRows(k), ours(k))
      rr.zip(or).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9, s"$k read") }
      rw.zip(ow).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9, s"$k write") }
    }
  }

  test("workbook: reference Data Size cells equal the engine's size tab") {
    val (_, cells, _) = golden
    val sheet = cells.get("Data Size")
    // layout (explore.py:1710-1716): title 0, header 1, data from 2,
    // 'Total' footer with an Excel SUM formula (engine computes the row)
    def cell(r: Int, c: Int): Option[JsonNode] = Option(sheet.get(s"$r,$c"))
    val refRows = Iterator.from(2).map(r => (r, cell(r, 0)))
      .takeWhile(_._2.exists(v => v.asText.nonEmpty && v.asText != "Total"))
      .map { case (r, _) =>
        (cell(r, 0).get.asText, cell(r, 1).get.asText, cell(r, 2).get.asDouble)
      }.toSeq
    assert(refRows.nonEmpty)
    // the engine's size sheet is the workload tab re-sorted by size desc
    val ours = DiagReport.analyze(spark, "src/test/resources/diag_mini")
      .workload.collect()
      .sortBy(r => (-r.getAs[Double]("size_bytes"),
        r.getAs[String]("keyspace"), r.getAs[String]("table")))
      .map(r => (r.getAs[String]("keyspace"), r.getAs[String]("table"),
        r.getAs[Double]("size_bytes"))).toSeq
    assert(refRows.length == ours.length,
      s"row count ref=${refRows.length} ours=${ours.length}")
    refRows.zip(ours).foreach { case (a, b) =>
      assert(a._1 == b._1 && a._2 == b._2, s"key order: $a vs $b")
      assert(math.abs(a._3 - b._3) < 1e-6, s"size: $a vs $b")
    }
  }

  test("workbook: reference Node Data cells equal the engine's node table") {
    val (_, cells, _) = golden
    val sheet = cells.get("Node Data")
    def cell(r: Int, c: Int): Option[JsonNode] = Option(sheet.get(s"$r,$c"))
    def nodeKey(n: JsonNode): String =
      if (n.isNumber) n.asLong.toString
      else n.asText.replace(".", "").replace("_", "")
    // header row 0, data from 1: (DC, Node, Load, Tokens, Rack,
    // Uptime(sec), Uptime, Workload, Version)
    val refRows = Iterator.from(1).map(r => (r, cell(r, 0)))
      .takeWhile(_._2.exists(_.asText.nonEmpty))
      .map { case (r, _) =>
        (cell(r, 0).get.asText, nodeKey(cell(r, 1).get), cell(r, 2).get.asText,
          cell(r, 3).get.asInt, cell(r, 4).get.asText, cell(r, 5).get.asLong,
          cell(r, 7).get.asText, cell(r, 8).get.asText)
      }.toSeq
    assert(refRows.length == 4)
    val ours = DiagReport.analyze(spark, "src/test/resources/diag_mini")
      .nodeTable.collect().map(r =>
        (r.getAs[String]("dc"),
          r.getAs[String]("node").replace(".", "").replace("_", ""),
          r.getAs[String]("load"), r.getAs[Int]("tokens"),
          r.getAs[String]("rack"), r.getAs[Long]("uptime_sec"),
          r.getAs[String]("workload"), r.getAs[String]("version"))).toSeq
    // two pinned intent deviations, asserted on both sides:
    //  (1) DSE Core version — the reference sets nd_version from
    //      dse_version ONLY inside the graph=='true' branch
    //      (explore.py:699-704), so a non-graph DSE node renders a
    //      blank Version; the engine reads dse_version for every DSE
    //      node (10.0.0.3 → "6.0.0").
    //  (2) the DOWN node 10.0.0.9 exists in status but has no node dir,
    //      so the reference (which iterates node dirs) never rows it;
    //      the engine keeps every status node (uptime 0) — the same
    //      asymmetry pinned on avg_uptime.
    val refFixed = refRows.map {
      case row @ (dc, node, load, tok, rack, up, wl, v) =>
        if (node == "10003") { assert(v == ""); (dc, node, load, tok, rack, up, wl, "6.0.0") }
        else row
    }
    val (down, present) = ours.partition(_._2 == "10009")
    assert(down == Seq(("dc2", "10009", "10.0 GiB", 256, "rack2", 0L,
      "OSS Cassandra", "4.0.11")))
    assert(refFixed.sorted == present.sorted, s"ref=$refFixed ours=$present")
  }

  test("workbook: threshold tabs equal the engine's rows, write bugs pinned") {
    val (_, cells, _) = golden
    // extra=0 sheets (explore.py:445-450) write per-node rows through a
    // ROW COUNTER THAT RESETS PER NODE — every node overwrites the
    // previous node's cells, so the final sheet holds only the LAST
    // listdir node's rows (a reference rendering bug; the engine keeps
    // every node's qualifying row). extra=1 sheets collapse per
    // (ks,tbl), intent max-per-table, actual LAST-WINS via the hasattr
    // bug (explore.py:1487) — so their representative node/dc may
    // differ from the engine's documented max+lowest-node tie-break,
    // while (ks, tbl, value) must agree.
    val perNodeTabs = Seq("dropped_mutation" -> "Dropped Mutation",
      "large_partition" -> "Large Partitions",
      "read_latency" -> "Read Latency", "write_latency" -> "Write Latency")
    val collapsedTabs = Seq("num_tables" -> "Number of Tables",
      "sstable_count" -> "SSTable Count")
    val th = DiagReport.analyze(spark, "src/test/resources/diag_mini")
      .thresholds.collect().groupBy(_.getAs[String]("tab"))
    def refRowsOf(sheetName: String): Seq[(String, String, String, String, Double)] = {
      val sheet = cells.get(sheetName)
      assert(sheet != null, s"reference did not write $sheetName")
      def cell(r: Int, c: Int): Option[JsonNode] = Option(sheet.get(s"$r,$c"))
      Iterator.from(1).map(r => (r, cell(r, 0)))
        .takeWhile(_._2.exists(_.asText.nonEmpty))
        .map { case (r, _) =>
          (cell(r, 0).get.asText, cell(r, 1).get.asText,
            cell(r, 2).get.asText, cell(r, 3).get.asText,
            cell(r, 4).get.asDouble)
        }.toSeq
    }
    def oursOf(key: String): Seq[(String, String, String, String, Double)] =
      th.getOrElse(key, Array.empty[org.apache.spark.sql.Row])
        .toSeq.map(r => (r.getAs[String]("node"), r.getAs[String]("dc"),
          r.getAs[String]("keyspace"), r.getAs[String]("table"),
          r.getAs[Double]("value")))
    for ((key, sheetName) <- perNodeTabs) {
      val (ref, ours) = (refRowsOf(sheetName), oursOf(key))
      val refNodes = ref.map(_._1).toSet
      assert(refNodes.size <= 1, s"$sheetName: overwrite bug premise broke: $refNodes")
      val oursLastNode = ours.filter(r => refNodes.contains(r._1))
      assert(ref.sorted == oursLastNode.sorted,
        s"$sheetName: ref=$ref oursAtNode=$oursLastNode")
      if (ref.isEmpty) assert(ours.isEmpty, s"$sheetName: $ours")
    }
    for ((key, sheetName) <- collapsedTabs) {
      val (ref, ours) = (refRowsOf(sheetName), oursOf(key))
      assert(ref.map(t => (t._3, t._4, t._5)).sorted ==
        ours.map(t => (t._3, t._4, t._5)).sorted,
        s"$sheetName: ref=$ref ours=$ours")
    }
  }

  // -------- fixture 2: a second tree shape through the dual-program
  // diff — single-DC DSE cluster (pre-5.0 + Analytics nodes), SAI +
  // secondary index + MV + UDT schema, identical 900 ms GC pauses (so
  // the banker's-vs-HALF_UP position difference cannot change the picked
  // value and the reference emits the GC warning too), a tombstone
  // 'live and' line, and '***'-tier table-count / large-partition
  // guardrails.
  private lazy val golden2: (JsonNode, JsonNode, JsonNode) = {
    val py = requireEnv()
    val fixture = Files.createTempDirectory("graft_golden2")
    copyTree(Paths.get("src/test/resources/diag_mini2"), fixture)
    assert(runReference(py, fixture) == 0, "reference failed on fixture 2")
    val ref = mapper.readTree(Files.readString(fixture.resolve("summary.json")))
    val cells = mapper.readTree(Files.readString(
      fixture.resolve("GoldenTwo_astra_chart.xlsx.celldump.json")))
    val ours = mapper.readTree(
      DiagReport.summaryJson(DiagReport.analyze(spark, fixture.toString)))
    (ref, cells, ours)
  }

  test("fixture 2: workload, dataset_size and ALL warnings at exact parity") {
    val (ref, _, ours) = golden2
    for (key <- Seq("workload", "dataset_size"))
      assert(diff(ref.get(key), ours.get(key), key).isEmpty,
        diff(ref.get(key), ours.get(key), key).mkString("\n"))
    assert(ref.get("missing_data").asInt == ours.get("missing_data").asInt)
    // every category/check, including the ***-tier messages, the empty
    // MV/SI/SAI lists, 'Not Supported' Analytics, and GC Pauses emitted
    // by BOTH programs on this fixture
    assert(diff(ref.get("warnings"), ours.get("warnings"), "warnings").isEmpty,
      diff(ref.get("warnings"), ours.get("warnings"), "warnings").mkString("\n"))
  }

  test("fixture 2 pinned: the avg_uptime row-cursor off-by-one finally separates") {
    val (ref, _, ours) = golden2
    // fixture 1 could not tell the two definitions apart (its one down
    // node has no dir); here 2 up nodes with 3600+7200 s make the
    // reference's total/(rows+1) visible
    assert(ref.get("avg_uptime").asDouble == 3600.0) // 10800 / 3
    assert(ours.get("avg_uptime").asDouble == 5400.0) // 10800 / 2
  }

  test("fixture 2 pinned: stale nd_version carry-over on the non-graph DSE node") {
    val (_, cells, _) = golden2
    val nd = cells.get("Node Data")
    def cell(r: Int, c: Int): JsonNode = nd.get(s"$r,$c")
    val byNode = (1 to 2).map(r => cell(r, 1).asText ->
      (cell(r, 7).asText, cell(r, 8).asText)).toMap
    // node 1: no graph key, no dse_version → 'DSE pre 5.0' on BOTH sides
    assert(byNode("172.16.0.1") == ("DSE Core", "DSE pre 5.0"))
    // node 2: graph==false skips the dse_version assignment
    // (explore.py:699-704) and nd_version is never reset between gossip
    // blocks — the reference renders node 1's STALE 'DSE pre 5.0';
    // the engine reads dse_version per node
    assert(byNode("172.16.0.2") == ("Analytics", "DSE pre 5.0"))
    val ours = DiagReport.analyze(spark, "src/test/resources/diag_mini2")
      .nodeTable.collect()
      .map(r => r.getAs[String]("node") ->
        (r.getAs[String]("workload"), r.getAs[String]("version"))).toMap
    assert(ours("172.16.0.1") == ("DSE Core", "DSE pre 5.0"))
    assert(ours("172.16.0.2") == ("Analytics", "6.0.4"))
  }

  test("workbook: merged title ranges and cell comments match the reference's") {
    val (_, cells, _) = golden
    // build OUR xlsx for the same fixture and pull each sheet's
    // mergeCells ranges + comment (ref → text) pairs out of the zip
    val outDir = Files.createTempDirectory("graft_golden_wb").toString
    DiagWorkbook.write(DiagReport.analyze(spark, "src/test/resources/diag_mini"), outDir)
    val xlsx = new java.util.zip.ZipFile(s"$outDir/TestCluster_astra_chart.xlsx")
    def part(name: String): Option[String] = Option(xlsx.getEntry(name)).map { e =>
      val in = xlsx.getInputStream(e)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    // sheet order is fixed (workbook.xml): index by name
    val sheetIdx = {
      val wb = part("xl/workbook.xml").get
      """<sheet name="([^"]+)" sheetId="(\d+)"""".r.findAllMatchIn(wb)
        .map(m => m.group(1) -> m.group(2).toInt).toMap
    }
    def ourMerges(sheet: String): Set[String] =
      part(s"xl/worksheets/sheet${sheetIdx(sheet)}.xml").toSeq.flatMap(x =>
        """<mergeCell ref="([^"]+)"/>""".r.findAllMatchIn(x).map(_.group(1))).toSet
    def ourComments(sheet: String): Map[String, String] =
      part(s"xl/comments${sheetIdx(sheet)}.xml").toSeq.flatMap(x =>
        """<comment ref="([^"]+)" authorId="0"><text><r><t[^>]*>([^<]*)</t>""".r
          .findAllMatchIn(x).map(m => m.group(1) -> m.group(2))).toMap
    def refMerges(sheet: String): Set[String] =
      cells.get(sheet).get("__merges__").elements.asScala.map(_.asText).toSet
    def refComments(sheet: String): Map[String, String] =
      cells.get(sheet).get("__comments__").properties.asScala
        .map(e => e.getKey -> e.getValue.asText).toMap
    try {
      // title merges are layout constants — exact set parity
      for (s <- Seq("Workload", "Data Size", "Proxihistogram"))
        assert(refMerges(s) == ourMerges(s), s"$s merges")
      // Astra Metrics title merges (the warning-section row merges
      // depend on the reference's per-row cursor, compared by count)
      assert(Set("A1:B1", "A2:B2").subsetOf(ourMerges("Astra Metrics")))
      assert(Set("A1:B1", "A2:B2").subsetOf(refMerges("Astra Metrics")))
      // comments: exact (coord → text) parity on the data sheets
      assert(refComments("Data Size") == ourComments("Data Size"), "ds comments")
      assert(refComments("Workload") == ourComments("Workload"), "wl comments")
      // metric-label comments carry the same texts at the same cells
      val amRef = refComments("Astra Metrics")
      val amOur = ourComments("Astra Metrics")
      for (c <- Seq("A3", "A4", "A5", "A6", "A7"))
        assert(amRef.get(c) == amOur.get(c), s"am comment $c")
    } finally xlsx.close()
  }

  test("pinned: tablestats-only node crashes the reference, not the engine") {
    val py = requireEnv()
    val raw = Files.createTempDirectory("graft_golden_raw")
    copyTree(Paths.get("src/test/resources/diag_mini"), raw)
    // no cfstats materialization: node 10.0.0.3 has only tablestats
    assert(runReference(py, raw) != 0,
      "expected the reference's fallback-less pass 2 (explore.py:1425) to fail")
    // the engine's S5 fallback handles the same tree end-to-end
    assert(DiagReport.analyze(spark, raw.toString).clusterName == "TestCluster")
  }
}
