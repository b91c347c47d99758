package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Catalog, Parser}

/** Golden parity: Parser.truthLinksRaw must reproduce the reference's own
  * extractor output on every (family, nVars, maxLag) equation set — including
  * the dropped-cubic and A2C-empty quirks (SURVEY §2.4-1).
  */
class ParserSpec extends AnyFunSuite {

  test("truth links match reference extractors on all 153 equation sets") {
    var checked = 0
    for (((fam, v, lag), expected) <- LinksGolden.golden) {
      val got = Parser.truthLinksRaw(fam, v, lag)
        .map(rl => (rl.parts, rl.coef))
      assert(got == expected, s"mismatch for ($fam, $v, $lag):\n got=$got\n exp=$expected")
      checked += 1
    }
    assert(checked == LinksGolden.golden.size)
    assert(checked >= 150)
  }

  test("generation links reproduce dropped-cubic quirk (B2 4-var lag-2)") {
    val prog = Parser.compileGen("B2", 4, 2)
    // only quadratic terms survive: (X1,-2,X4,^2) .25, (X4,0,X3,^2) .35,
    // (X3,-1,X2,^2) .3, (X2,0,X1,^2) .4   (SURVEY §2.4-1, verified vs b2.py)
    val deps = prog.byVar.toVector.map(_.map(d => (d.srcName, d.lag, d.pow, d.coef)))
    assert(deps(3) == Vector(("X1", 2, 2, 0.25)))
    assert(deps(2) == Vector(("X4", 0, 2, 0.35)))
    assert(deps(1) == Vector(("X3", 1, 2, 0.3)))
    assert(deps(0) == Vector(("X2", 0, 2, 0.4)))
  }

  test("A2C generation links are empty (pure-noise quirk)") {
    for (v <- Seq(4, 6, 8); lag <- Seq(2, 3, 4)) {
      val prog = Parser.compileGen("A2C", v, lag)
      assert(prog.byVar.forall(_.isEmpty), s"A2C $v/$lag should have no gen links")
      assert(prog.linkTargets.isEmpty)
    }
  }

  test("C2C/D3C U terms compile linear despite declared power (dead-branch quirk)") {
    for (fam <- Seq("C2C", "D3C")) {
      val prog = Parser.compileGen(fam, 4, 2)
      val uDeps = prog.eqs.flatMap(_.terms).collect {
        case d: Parser.GTerm.Dep if d.isU => d
      }
      assert(uDeps.nonEmpty)
      assert(uDeps.forall(_.func == Parser.Func.Linear), s"$fam U must be linear")
    }
    // but B2C applies the declared power
    val b2c = Parser.compileGen("B2C", 4, 2)
    val uDeps = b2c.byVar.toVector.flatten.filter(_.isU)
    assert(uDeps.nonEmpty && uDeps.forall(_.pow == 2))
  }

  test("strict parser recovers the dropped cubic terms (declared vs effective)") {
    val strict = Parser.strictLinks("B2", 4, 2)
    // declared: quadratic + cubic per edge = 8 causal terms
    assert(strict.length == 8)
    val cubics = strict.filter(_.power == 3)
    assert(cubics.length == 4)
    assert(cubics.forall(_.coef < 0), "cubic terms are minus-signed")
    assert(cubics.map(c => (c.source, c.lag, c.target)).toSet ==
      Set(("X1", 2, "X4"), ("X4", 0, "X3"), ("X3", 1, "X2"), ("X2", 0, "X1")))
    // effective (compat) keeps only the 4 quadratics
    val compat = Parser.compileGen("B2", 4, 2).byVar.flatten
    assert(compat.length == 4 && compat.forall(_.pow == 2))
    // linear family: strict == compat link set
    val strictA1 = Parser.strictLinks("A1", 4, 2).map(l => (l.source, l.lag, l.target, l.coef)).toSet
    val compatA1 = Parser.truthLinks("A1", 4, 2).map(l => (l.source, l.lag, l.target, l.coef)).toSet
    assert(strictA1 == compatA1)
  }

  test("catalog covers all 18 families x 9 shapes") {
    assert(Catalog.families.size == 18)
    for (fam <- Catalog.families; v <- Seq(4, 6, 8); lag <- Seq(2, 3, 4))
      assert(Catalog.equations.contains((fam, v, lag)), s"missing ($fam,$v,$lag)")
  }
}
