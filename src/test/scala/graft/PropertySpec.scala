package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core._

/** Property-based invariants over ScalaCheck generators (raw Gen sampling —
  * the scalatest/scalacheck bridge artifact isn't in the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def samples[T](gen: Gen[T], n: Int): Seq[T] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(42L))(_.next).take(n)
      .flatMap(seed => gen.apply(params, seed)).toSeq
  }

  private def forAll[A](gen: Gen[A], n: Int = 20)(body: A => Unit): Unit =
    samples(gen, n).foreach(body)

  private val famGen = Gen.oneOf(Catalog.families)
  private val shapeGen = for {
    f <- famGen; v <- Gen.oneOf(4, 6, 8); l <- Gen.oneOf(2, 3, 4)
  } yield (f, v, l)

  test("kernel output shape/finiteness invariants hold for random configs") {
    val gen = for { sh <- shapeGen; n <- Gen.oneOf(100, 257, 500); id <- Gen.choose(0L, 1000L) } yield (sh, n, id)
    forAll(gen, 25) { case ((fam, v, lag), n, id) =>
      val spec = Kernel.specs(fam)
      val noise = fam match {
        case "B2" | "B2C" | "D3" | "D3C" => "mixed"
        case "C1" | "C1C" => "gaussian"
        case _ => "gaussian"
      }
      val ts = spec.trendSeason
      val cfg = GenConfig(id, fam, v, lag, n, noise, 0.1, 0.5,
        if (spec.mcar) 0.1 else 0.0, if (spec.block) 0.1 else 0.0,
        if (ts) 0.01 else 0.0, if (ts) 0.5 else 0.0, 42L)
      val s = Kernel.generate(cfg)
      assert(s.times.length == n && s.x.length == n && s.mask.length == n)
      assert(s.x.forall(_.length == v))
      // timestamps strictly ordered (irregular) or exactly 0..n-1 (regular)
      if (spec.irregular) {
        assert(s.times.sliding(2).forall(p => p(0) <= p(1)))
        assert(s.times.last <= 100.0 + 1e-9)
      } else assert(s.times.zipWithIndex.forall { case (t, i) => t == i.toDouble })
      // masks only where the family has missingness, never beyond nVars
      if (!spec.mcar && !spec.block) assert(s.mask.forall(_ == 0))
      assert(s.mask.forall(m => (m >> v) == 0))
      // U present iff confounded
      assert(s.u.nonEmpty == spec.hasU)
      // gaussian-family values finite (mixed/t families may legitimately explode)
      if (noise == "gaussian" && !Set("C1", "C1C", "C2", "C2C").contains(fam))
        assert(s.x.forall(_.forall(d => !d.isNaN && !d.isInfinite)))
    }
  }

  test("determinism: configId/seed fully determine the series") {
    val gen = for { sh <- shapeGen; id <- Gen.choose(0L, 500L) } yield (sh, id)
    forAll(gen, 10) { case ((fam, v, lag), id) =>
      val ts = Kernel.specs(fam).trendSeason
      val cfg = GenConfig(id, fam, v, lag, 120, "gaussian", 0.1, 1.0, 0.05, 0.05,
        if (ts) 0.01 else 0.0, if (ts) 0.5 else 0.0, 7L)
      val a = Kernel.generate(cfg)
      val b = Kernel.generate(cfg)
      assert(a.x.flatten.toSeq == b.x.flatten.toSeq)
      assert(a.mask.toSeq == b.mask.toSeq)
      // a different stream differs (overwhelmingly)
      val c = Kernel.generate(cfg.copy(configId = id + 10000))
      assert(a.x.flatten.toSeq != c.x.flatten.toSeq)
    }
  }

  test("truth links are well-formed for every shape") {
    for (fam <- Catalog.families; v <- Seq(4, 6, 8); lag <- Seq(2, 3, 4)) {
      val links = Parser.truthLinks(fam, v, lag)
      assert(links.nonEmpty)
      links.foreach { l =>
        assert(l.lag >= 0 && l.lag <= lag, s"$fam $l")
        assert(l.target.startsWith("X"))
        assert(l.source == "U" || l.source.drop(1).toInt <= v)
        assert(l.coef != 0.0)
      }
    }
  }

  test("strict links are a superset of compat gen links for B families") {
    for (fam <- Seq("B1", "B1C", "B2", "B2C", "D2", "D2C"); v <- Seq(4, 6, 8); lag <- Seq(2, 3, 4)) {
      val strict = Parser.strictLinks(fam, v, lag)
      val compat = Parser.compileGen(fam, v, lag).byVar.flatten
      assert(strict.length >= compat.length, s"$fam $v $lag")
      // every surviving compat dep's (source, lag) appears in the strict set
      val strictKeys = strict.map(l => (l.source, l.lag)).toSet
      compat.foreach(d =>
        assert(strictKeys.contains((d.srcName, d.lag)), s"$fam $v $lag missing $d"))
    }
  }
}
