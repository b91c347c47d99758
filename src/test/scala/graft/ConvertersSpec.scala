package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.metrics.Converters

class ConvertersSpec extends AnyFunSuite {

  test("parseLaggedName (R2)") {
    assert(Converters.parseLaggedName("Frequency_2") == ("Frequency", 2))
    assert(Converters.parseLaggedName("X1_0") == ("X1", 0))
    assert(Converters.parseLaggedName("X1") == ("X1", 0))
    assert(Converters.parseLaggedName("a_b_3") == ("a_b", 3))
  }

  test("tigramite string checker whitelists link strings (R4)") {
    val ok = Array.fill(2, 2, 1)("")
    ok(0)(1)(0) = "-->"
    assert(Converters.stringChecker(ok))
    val bad = Array.fill(2, 2, 1)("")
    bad(1)(0)(0) = "==>"
    intercept[IllegalArgumentException](Converters.stringChecker(bad))
  }

  test("tigramite categorical graph: orientation flip for '<--'") {
    val g = Array.fill(3, 3, 2)("")
    g(0)(1)(0) = "-->" // X1 -> X2 contemporaneous
    g(2)(0)(1) = "<--" // stored at (2,0) means X1 causes X3 → flips to (0,2)
    g(1)(2)(0) = "o-o"
    val codes = Converters.makeCategoricalCausalGraph(g)
    assert(codes(0)(1)(0) == 1)
    assert(codes(0)(2)(1) == 1) // flipped
    assert(codes(2)(0)(1) == 0)
    assert(codes(1)(2)(0) == 3)
  }

  test("tetrad endpoint matrix → tensor: strict TAIL/ARROW with lag normalization (R3)") {
    // lagged names X1_0, X2_0, X1_1, X2_1; edge X2 at lag 1 -> X1 at lag 0:
    // (a_uv, a_vu) = (TAIL=2, ARROW=3) at (X2_1, X1_0)
    val names = Seq("X1_0", "X2_0", "X1_1", "X2_1")
    val adj = Array.fill(4, 4)(0)
    adj(3)(0) = 2 // tail at X2_1 side
    adj(0)(3) = 3 // arrow at X1_0 side
    val (tensor, bases, maxLag) = Converters.adjMatrixToCausalTensor(names, adj)
    assert(bases == Seq("X1", "X2") && maxLag == 1)
    assert(tensor(1)(0)(1)) // X2 at t-1 -> X1
    assert(tensor.flatten.flatten.count(identity) == 1)
  }

  test("tetrad converter rejects invalid endpoint pairs and future→past edges") {
    val names = Seq("X1_0", "X2_0")
    val bad = Array.fill(2, 2)(0)
    bad(0)(1) = 1; bad(1)(0) = 3 // CIRCLE/ARROW not whitelisted
    intercept[IllegalArgumentException](Converters.adjMatrixToCausalTensor(names, bad))

    // future→past: source lag 0 -> target lag 1 gives normalized −1
    val names2 = Seq("X1_0", "X2_1")
    val fp = Array.fill(2, 2)(0)
    fp(0)(1) = 2; fp(1)(0) = 3
    intercept[IllegalArgumentException](Converters.adjMatrixToCausalTensor(names2, fp))
  }

  test("toBoolEdges codes (R6): 3 counted once, 4 sets both directions") {
    val m = Array.fill(2, 2, 1)(0)
    m(0)(1)(0) = 3
    val b1 = Converters.toBoolEdges(m)
    assert(b1(0)(1)(0) && !b1(1)(0)(0))
    m(0)(1)(0) = 4
    val b2 = Converters.toBoolEdges(m)
    assert(b2(0)(1)(0) && b2(1)(0)(0))
  }

  test("tcdf make matrices (R5): (effect, cause) keys, cause→effect cells") {
    val (graph, vals) = Converters.tcdfMakeMatrices(
      Map((1, 0) -> 2, (2, 1) -> 0), nVars = 3,
      allScores = Map(1 -> Map(0 -> 0.7)))
    assert(graph(0)(1)(2) && graph(1)(2)(0))
    assert(vals(0)(1)(2) == 0.7 && vals(1)(2)(0) == 1.0)
  }

  test("tcdf threshold path (tcdf_helper.py:40-55): no-threshold is !=0, " +
      "threshold is strict >, NaN follows IEEE") {
    val scores = Array(
      Array(Array(0.0, 0.5), Array(0.7, -0.2)),
      Array(Array(Double.NaN, 0.0), Array(1.0, 0.5)))
    // threshold=None → a != 0 (NaN != 0 is TRUE in NumPy)
    val noThr = Converters.toBoolArray(scores, None)
    assert(!noThr(0)(0)(0) && noThr(0)(0)(1) && noThr(0)(1)(0) &&
      noThr(0)(1)(1))
    assert(noThr(1)(0)(0) && !noThr(1)(0)(1))
    // threshold=0.5 → a > 0.5 strictly; NaN > t is false
    val thr = Converters.toBoolArray(scores, Some(0.5))
    assert(!thr(0)(0)(1) && thr(0)(1)(0) && !thr(0)(1)(1))
    assert(!thr(1)(0)(0) && thr(1)(1)(0) && !thr(1)(1)(1))
  }

  test("tcdf ensure3dBool: 2D promotes to one lag slice, bool passes " +
      "through as a copy, wrong rank raises") {
    val m2 = Array(Array(0.0, 0.9), Array(0.3, 0.0))
    val p = Converters.ensure3dBool(m2, Some(0.5))
    assert(p.length == 2 && p(0)(0).length == 1)
    assert(!p(0)(0)(0) && p(0)(1)(0) && !p(1)(0)(0))
    // bool input: threshold ignored, result is a copy (mutating it does
    // not alias the input) — tcdf_helper.py:42-43
    val b = Array(Array(Array(true), Array(false)))
    val c = Converters.ensure3dBool(b: AnyRef, Some(0.99))
    assert(c(0)(0)(0) && !c(0)(1)(0))
    c(0)(0)(0) = false
    assert(b(0)(0)(0))
    // 2D bool promotes too
    val b2 = Converters.ensure3dBool(Array(Array(true, false)): AnyRef, None)
    assert(b2(0)(0)(0) && !b2(0)(1)(0))
    // rank guard mirrors the reference ValueError
    intercept[IllegalArgumentException] {
      Converters.ensure3dBool(Array(1.0, 2.0): AnyRef, None)
    }
  }

  test("tcdf graph-at-threshold wires makeMatrices' val tensor") {
    val delays = Map((1, 0) -> 1, (2, 1) -> 0)
    val scores = Map(1 -> Map(0 -> 0.7))
    // default score 1.0 survives any threshold < 1; 0.7 is cut at 0.8
    val g = Converters.tcdfGraphAtThreshold(delays, 3, scores, Some(0.8))
    assert(!g(0)(1)(1) && g(1)(2)(0))
    val gAll = Converters.tcdfGraphAtThreshold(delays, 3, scores, None)
    assert(gAll(0)(1)(1) && gAll(1)(2)(0))
  }

  test("local SHD mirrors: reversal costs 1 structural, 2 xor") {
    val gt = Array.fill(2, 2, 1)(false)
    val pred = Array.fill(2, 2, 1)(false)
    gt(0)(1)(0) = true
    pred(1)(0)(0) = true
    assert(Converters.shdByXor(gt, pred) == 2)
    assert(Converters.shdStructural(gt, pred) == 1)
    // self-loop add costs 1
    val p2 = Array.fill(2, 2, 1)(false)
    p2(0)(0)(0) = true
    assert(Converters.shdStructural(Array.fill(2, 2, 1)(false), p2) == 1)
    // confusion counts
    assert(Converters.confusionCounts(gt, pred) == (0, 1, 1, 2))
  }
}
