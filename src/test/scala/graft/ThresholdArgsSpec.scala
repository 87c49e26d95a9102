package graft

import org.scalatest.funsuite.AnyFunSuite

/** DiagReport CLI threshold parsing: reference -tp_* flags with
  * guardrail clamping (explore.py:140-171). */
class ThresholdArgsSpec extends AnyFunSuite {

  test("flags parsed, positional args pass through in order") {
    val (roots, tp, inclSys) = DiagReport.parseArgs(Seq(
      "-tp_rl", "50", "diagA", "-tp_ts", "500", "-incl_sys", "diagB", "out"))
    assert(roots == Seq("diagA", "diagB", "out"))
    assert(tp.tpRlMs == 50.0 && tp.tpTs == 500L)
    assert(inclSys)
  }

  test("guardrail-clamped flags reject values above the guardrail") {
    val (_, tp, _) = DiagReport.parseArgs(Seq(
      "-tp_lpar", "500", "-tp_mv", "1", "x", "y")) // 500 > gr 200 → ignored
    assert(tp.tpLparMb == 100) // default kept
    assert(tp.tpMv == 1)       // 1 ≤ gr 2 → applied
  }

  test("defaults match the reference's constants") {
    val tp = graft.model.Thresholds()
    assert(tp.tpMv == 2 && tp.tpSi == 1 && tp.tpSai == 8)
    assert(tp.tpTblCnt == 155 && tp.tpColCnt == 45 && tp.tpLparMb == 100)
    assert(tp.tpRlMs == 100 && tp.tpWlMs == 100 && tp.tpSstbl == 20)
    assert(tp.tpGcpMs == 800 && tp.tpDrm == 100000L && tp.tpTs == 1000L)
    assert(tp.grMv == 2 && tp.grSi == 1 && tp.grSai == 50)
    assert(tp.grTblCnt == 200 && tp.grColCnt == 75 && tp.grLparMb == 200)
  }
}
