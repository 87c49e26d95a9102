package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Spark-bump canary (r12 verdict #7): the engine has exactly two
  * couplings to Spark surfaces that are not public API stability
  * contracts — the `classic.ExpressionUtils` Column bridge
  * (`GraftColumnBridge`) and the `UTF8String` byte-walk semantics every
  * token kernel's `TokensH60.fields` relies on. A Spark minor bump that
  * drifts either should fail HERE, in one named spec, instead of as 13
  * kernel parity failures.
  *
  * Deliberately sessionless (no SparkTestBase): the contracts under
  * test are pure-JVM, so the canary runs first and fast even when a
  * bump breaks session bootstrap itself.
  */
class SparkCouplingCanarySpec extends AnyFunSuite {

  test("canary: GraftColumnBridge round-trips a custom Expression") {
    val e = org.apache.spark.sql.catalyst.expressions.Literal(42)
    val c = org.apache.spark.sql.GraftColumnBridge.column(e)
    val back = org.apache.spark.sql.GraftColumnBridge.expression(c)
    assert(back == e,
      "classic.ExpressionUtils drifted — GraftColumnBridge (and the " +
        "broadcast-model kernels behind it: LexKernels vocab/BPE) needs " +
        "a new Column<->Expression route for this Spark version")
  }

  test("canary: UTF8String contracts behind TokensH60.fields hold") {
    // trim: ASCII space ONLY — the byte walk assumes \t survives trim
    assert(UTF8String.fromString("  a b\t").trim().toString == "a b\t",
      "UTF8String.trim no longer strips ASCII space only")
    assert(UTF8String.fromString("\ta\t").trim().toString == "\ta\t",
      "UTF8String.trim started stripping non-space whitespace — the " +
        "kernel walk's trim/lower chain no longer matches Spark's trim()")
    // toLowerCase: must lowercase ASCII and keep byte-level UTF-8 validity
    val lc = UTF8String.fromString("AbC Ä 世").toLowerCase
    assert(lc.toString == "abc ä 世", "UTF8String.toLowerCase drifted")
    // zero-copy slice semantics: fromBytes(b, off, len) views the bytes,
    // equality/hash are BYTE-wise (the kernels key hash maps on slices)
    val b = "xx hello yy".getBytes("UTF-8")
    val slice = UTF8String.fromBytes(b, 3, 5)
    assert(slice == UTF8String.fromString("hello") &&
      slice.hashCode == UTF8String.fromString("hello").hashCode,
      "UTF8String byte-slice equality/hash drifted")
    // compareTo: binary (unsigned byte) order — the pinned tie-break
    // semantics shared with DuckDB string sorts
    assert(UTF8String.fromString("a").compareTo(UTF8String.fromString("é")) < 0,
      "UTF8String.compareTo is no longer binary order")
    // getBytes on a sliced string must return exactly the slice
    assert(new String(slice.getBytes, "UTF-8") == "hello",
      "UTF8String.getBytes drifted on sliced strings")
  }

  test("canary: TokensH60.fields still replicates Pattern.split(limit -1)") {
    // the byte walk's field-structure contract on the edge shapes the
    // fuzz spec derives from the LIVE regex — pinned here standalone so
    // a Pattern/UTF8String drift is named, not discovered via dd05
    def fields(s: String): Seq[String] = {
      import scala.jdk.CollectionConverters._
      graft.functions.TokensH60.fields(UTF8String.fromString(s))
        .asScala.map(_.toString).toSeq
    }
    assert(fields("") == Seq(""))
    assert(fields("a  b") == Seq("a", "b"))
    assert(fields(" a") == Seq("a"))           // trim strips the lead space
    assert(fields("\ta") == Seq("", "a"))      // \t survives trim -> "" field
    assert(fields("a\t") == Seq("a", ""))      // trailing separator -> ""
    assert(fields("A 世B") == Seq("a", "世b"))
  }
}
