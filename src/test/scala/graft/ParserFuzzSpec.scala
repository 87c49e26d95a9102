package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.Parsers

/** No-crash fuzzing for every parser entry point: each diag file is
  * parsed whole inside one task, so a parser that throws on a malformed
  * line kills the whole file's task — the contract is "skip what you
  * can't parse", never "throw". Inputs: seeded random line soup, and
  * structure-aware mutations (valid-looking prefixes with corrupted
  * tails) that reach deeper than pure noise.
  */
class ParserFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260812L)

  private val structuredSeeds = Seq(
    "Datacenter: dc1",
    "UN  10.0.0.1  1.2 GiB  256  ?  abc  r1",
    "/10.0.0.3",
    "  DC:dc2",
    "  X_11_PADDING:{\"workload\":\"Search\",\"graph\":true",
    "Keyspace : ks1",
    "\t\tTable: users",
    "\t\tLocal read count: ",
    "Percentile  Read Latency  Write Latency",
    "50%  1310.72",
    "CREATE TABLE ks1.users (id uuid PRIMARY KEY",
    "CREATE KEYSPACE ks1 WITH replication = {'class':",
    "INFO  [Service Thread] 2023-03-01 10:00:00,123 GCInspector.java:284 - ParNew GC in",
    "WARN  ReadCommand Read 5 live rows and 99999 tombstone cells in ks1.users",
    "Uptime (seconds) :")

  private def garbageLine(): String = rnd.nextInt(4) match {
    case 0 => rnd.nextString(rnd.nextInt(60)) // arbitrary unicode
    case 1 => Array.fill(rnd.nextInt(30))(rnd.nextPrintableChar()).mkString
    case 2 => // mutated structured seed: truncate / splice / double
      val s = structuredSeeds(rnd.nextInt(structuredSeeds.length))
      rnd.nextInt(3) match {
        case 0 => s.take(rnd.nextInt(s.length + 1))
        case 1 => s + structuredSeeds(rnd.nextInt(structuredSeeds.length))
        case _ => s.updated(rnd.nextInt(s.length), ':')
      }
    case _ => Seq("", " ", "\t", ":::", "{", "}", "1.2.3.4.5.6/", "NaN ms")(rnd.nextInt(8))
  }

  private def docs: Seq[Seq[String]] =
    (1 to 200).map(_ => Seq.fill(rnd.nextInt(25))(garbageLine()))

  test("every parser survives 200 random/mutated documents") {
    docs.foreach { lines =>
      Parsers.parseStatus(lines.iterator).toList
      Parsers.parseGossip(lines.iterator)
      Parsers.getParam(lines.iterator, "Uptime", 3)
      Parsers.parseCfstats("n1", lines.iterator).toList
      Parsers.parseProxyHist("n1", lines.iterator).toList
      Parsers.parseSchema(lines.iterator, Seq("dc1", "dc2"))
      lines.foreach(l => Parsers.parseGcLine("n1", l))
      Parsers.parseLog("n1", lines.iterator)
      lines.foreach(Parsers.extractIp)
    }
  }

  test("parsers survive pathological whole-file shapes") {
    val shapes = Seq(
      Seq.empty[String],
      Seq(""),
      Seq.fill(1000)("Datacenter: dc1"),          // header spam, no rows
      Seq.fill(1000)("/10.0.0.1"),                // gossip block spam
      Seq("Keyspace : ks1") ++ Seq.fill(500)("\t\tTable: t"), // tables, no metrics
      Seq("CREATE TABLE ks.t (" + "c int," * 500) // unterminated giant DDL
    )
    shapes.foreach { lines =>
      Parsers.parseStatus(lines.iterator).toList
      Parsers.parseGossip(lines.iterator)
      Parsers.parseCfstats("n1", lines.iterator).toList
      Parsers.parseProxyHist("n1", lines.iterator).toList
      Parsers.parseSchema(lines.iterator, Seq("dc1"))
      Parsers.parseLog("n1", lines.iterator)
    }
  }
}
