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
