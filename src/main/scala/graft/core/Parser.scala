package graft.core

import scala.collection.mutable

/** Compatibility parser for the reference's equation DSL (SURVEY §1.3).
  *
  * The reference interprets equation STRINGS at runtime with family-specific
  * extractors that all split terms on '+' only — so minus-signed sub-terms are
  * silently dropped (cubic terms in B/D2 families, SURVEY §2.4-1) and A2C's
  * extractor drops EVERYTHING (`'e' in rhs` filter, a2c.py:226-251 — shipped
  * A2C data is pure noise, verified empirically). This parser reproduces those
  * effective semantics term-for-term; `truthLinks` reproduces each family's
  * published ground-truth link dict and is golden-tested against the output of
  * the reference's own extractor functions on all 153 equation sets.
  *
  * Reference extractors mirrored here:
  *   a1.py:214-235, a1c.py:278-301, a2.py:108-129, a2c.py:252-277,
  *   b1c.py:62-93 & 160-202, b2.py:160-221, c1.py:248-290, c1c.py:301-347,
  *   d3c.py:121-169, d1.py:237, d2.py:199-253.
  */
object Parser {

  /** A raw link in the family's native key format (for golden parity tests). */
  final case class RawLink(parts: Vector[String], coef: Double)

  // Python str.split(sep) semantics: keep all fields.
  private def psplit(s: String, sep: String): Array[String] =
    s.split(java.util.regex.Pattern.quote(sep), -1)

  private def after(s: String, sep: String): String = {
    val i = s.indexOf(sep); s.substring(i + sep.length)
  }

  // ---------------------------------------------------------------------------
  // Truth-link extraction (per-family native formats)
  // ---------------------------------------------------------------------------

  /** Truth links in the family's native key format, insertion-ordered. */
  def truthLinksRaw(family: String, nVars: Int, maxLag: Int): Vector[RawLink] = {
    val eqs = Catalog.equations((family, nVars, maxLag))
    family match {
      case "A1" | "D1"           => aStyle(eqs, allowU = false)
      case "A1C" | "A2C" | "D1C" => aStyle(eqs, allowU = true)
      case "A2"                  => a2Style(eqs)
      case "B1" | "B2" | "D2"    => bGraphStyle(eqs, allowU = false, sum = false)
      case "B1C"                 => bGraphStyle(eqs, allowU = true, sum = true)
      case "B2C" | "D2C"         => bGraphStyle(eqs, allowU = true, sum = false)
      case "C1" | "C2"           => cIntStyle(eqs)
      case "C1C"                 => c1cStyle(eqs)
      case "C2C" | "D3" | "D3C"  => d3cStyle(eqs)
      case other => throw new IllegalArgumentException(s"unknown family $other")
    }
  }

  /** Normalized Dataset-friendly truth links (lag stored non-negative). */
  def truthLinks(family: String, nVars: Int, maxLag: Int): Vector[CausalLink] =
    truthLinksRaw(family, nVars, maxLag).map { rl =>
      val (src, lag, tgt, func) = rl.parts match {
        case Vector(s, l, t)    => (name(s), math.abs(l.toInt), name(t), "linear")
        case Vector(s, l, t, f) => (name(s), math.abs(l.toInt), name(t), f)
        case p => throw new IllegalStateException(s"bad raw link $p")
      }
      CausalLink(family, nVars, maxLag, src, lag, tgt, func, rl.coef)
    }

  private def name(s: String): String = if (s.forall(_.isDigit)) s"X$s" else s

  /** EFFECTIVE link coefficients under the DEFAULT (quirk-preserving)
    * kernel — [[truthLinks]] with the coefficient zeroed for links whose
    * dependency term evaluates against a not-yet-computed X[t] cell
    * (SURVEY §2.4-2, the "zero-valued contemporaneous links"):
    *
    *  - EqReverse / LinkReverse (a1.py:147-192, b2.py:109-132): evaluation
    *    walks var indices v-1..0, so a lag-0 dep on a LOWER-indexed X
    *    source reads the zero-initialized cell → effective coef 0.0.
    *  - ListOrder (c1.py:196-222, d3c.py:333-363): equation-list order, so
    *    a lag-0 dep on an X source whose equation appears LATER in the
    *    list reads zero.
    *  - LinkPrePass (a2.py:169-201): exogenous (non-target) vars are
    *    assigned in the pre-pass, so lag-0 deps on them are live at any
    *    index; the target loop then runs in reverse index order, so a
    *    lag-0 dep on a lower-indexed fellow TARGET reads zero (and the
    *    value-≠0 rule skips that target's noise too — its series is
    *    constant 0 when the dead dep was its only term).
    *  - TwoPassShadow (d1.py:136-204): pass 1 evaluates lag-only
    *    equations and records each one's LAST dep SOURCE name in
    *    var_values; pass 2 SKIPS any equation whose target was so
    *    recorded — those vars stay exactly 0 (the documented D1 X1/X3
    *    quirk), so links INTO a skipped target and links FROM one (its
    *    series is constant 0 at every lag) are both effective 0. For
    *    the shipped D1 4-var cells this kills the whole graph: the
    *    surviving pass-1 targets read only zeroed sources, leaving
    *    every X series either exactly 0 or pure noise.
    *  - ToposortRetry resolves contemporaneous parents before use and
    *    returns the declared links.
    *
    * U links are never zeroed (U is drawn before the X loop in every
    * strategy). Strict mode (§2.4's corrected kernel) restores the
    * declared value — the q353 default-vs-strict estimator contrast pins
    * exactly this difference from generated data alone.
    */
  def effectiveLinks(family: String, nVars: Int, maxLag: Int): Vector[CausalLink] = {
    val base = truthLinks(family, nVars, maxLag)
    val prog = compileGen(family, nVars, maxLag)
    // a published link with NO corresponding compiled dependency term is
    // dead outright — the A2C extreme (its `'e' in rhs` filter drops
    // EVERY link, a2c.py:226-251, so the whole family generates pure
    // noise while its truth dict still declares edges)
    def compiled(l: CausalLink): Boolean = {
      val deps: Seq[GTerm.Dep] =
        if (prog.eqs.nonEmpty)
          prog.eqs.filter(_.targetName == l.target)
            .flatMap(_.terms.collect { case d: GTerm.Dep => d })
        else {
          val ti = varIdx(l.target)
          if (ti >= 0 && ti < prog.byVar.length) prog.byVar(ti) else Nil
        }
      deps.exists(d => d.srcName == l.source && d.lag == l.lag)
    }
    def deadIdxOrder(l: CausalLink): Boolean =
      l.lag == 0 && l.source != "U" && varIdx(l.source) < varIdx(l.target)
    def deadListOrder(l: CausalLink): Boolean = {
      def pos(v: String): Int = prog.eqs.indexWhere(_.targetName == v)
      l.lag == 0 && l.source != "U" && pos(l.source) > pos(l.target)
    }
    val present = base.map(l =>
      if (compiled(l)) l else l.copy(coef = 0.0))
    prog.strategy match {
      case Strategy.EqReverse | Strategy.LinkReverse =>
        present.map(l => if (deadIdxOrder(l)) l.copy(coef = 0.0) else l)
      case Strategy.ListOrder =>
        present.map(l => if (deadListOrder(l)) l.copy(coef = 0.0) else l)
      case Strategy.LinkPrePass =>
        present.map(l => if (deadIdxOrder(l) &&
          prog.linkTargets.contains(varIdx(l.source)))
          l.copy(coef = 0.0) else l)
      case Strategy.TwoPassShadow =>
        // replay the shadow protocol on equation metadata (kernel order)
        val vv = scala.collection.mutable.Set.empty[String]
        prog.eqs.foreach(eq => if (eq.pass1Eligible) vv += eq.shadowName)
        val zeroVars = scala.collection.mutable.Set.empty[String]
        prog.eqs.foreach { eq =>
          if (!eq.pass1Eligible) {
            if (vv.contains(eq.targetName)) zeroVars += eq.targetName
            else vv += eq.targetName
          }
        }
        present.map(l => if (l.source != "U" && zeroVars.contains(l.source)
            || zeroVars.contains(l.target))
          l.copy(coef = 0.0) else l)
      case _ => present
    }
  }

  /** a1.py:214-235 / a1c.py:278-301: (src, -lag, target) -> coef. */
  private def aStyle(eqs: Vector[String], allowU: Boolean): Vector[RawLink] = {
    val links = mutable.LinkedHashMap.empty[Vector[String], Double]
    for (eq <- eqs if eq.contains('=')) {
      val Array(left, right) = psplit(eq, "=").map(_.trim)
      val target = psplit(left, "[")(0)
      if (!(allowU && target == "U")) {
        for (term0 <- psplit(right, "+"); term = term0.trim) {
          val ok =
            if (allowU) term.contains('*') && (term.contains('X') || term.contains('U'))
            else term.contains('*') && term.contains('X')
          if (ok) {
            val parts = psplit(term, "*")
            val coef = parts(0).trim.toDouble
            val varPart = parts(1).trim
            val v = psplit(varPart, "[")(0)
            val lagPart = psplit(psplit(varPart, "[")(1), "]")(0)
            val lag = if (lagPart == "t") 0 else -psplit(lagPart, "-")(1).toInt
            links(Vector(v, lag.toString, target)) = coef
          }
        }
      }
    }
    links.iterator.map { case (k, c) => RawLink(k, c) }.toVector
  }

  /** a2.py:108-129: skips any equation containing 'noise' (exogenous marker). */
  private def a2Style(eqs: Vector[String]): Vector[RawLink] = {
    val links = mutable.LinkedHashMap.empty[Vector[String], Double]
    for (eq <- eqs if eq.contains('=') && !eq.contains("noise")) {
      val Array(left, right) = psplit(eq, "=").map(_.trim)
      val target = psplit(left, "[")(0)
      for (term0 <- psplit(right, "+"); term = term0.trim)
        if (term.contains('*') && term.contains('X')) {
          val parts = psplit(term, "*").map(_.trim)
          val varPart = parts(1)
          val v = psplit(varPart, "[")(0)
          val lagPart = psplit(psplit(varPart, "[")(1), "]")(0)
          val lag = if (lagPart == "t") 0 else -psplit(lagPart, "-")(1).toInt
          links(Vector(v, lag.toString, target)) = parts(0).toDouble
        }
    }
    links.iterator.map { case (k, c) => RawLink(k, c) }.toVector
  }

  /** b2.py:196-221 / b1c.py:62-93: power stripped from the var name; only the
    * leading (quadratic) coefficient of each '+'-term survives (§2.4-1).
    */
  private def bGraphStyle(eqs: Vector[String], allowU: Boolean, sum: Boolean): Vector[RawLink] = {
    val links = mutable.LinkedHashMap.empty[Vector[String], Double]
    for (eq <- eqs if eq.contains('=')) {
      val Array(left, right) = psplit(eq, "=").map(_.trim)
      val target = psplit(left, "[")(0)
      if (!(allowU && target == "U")) {
        for (term0 <- psplit(right, "+"); term = term0.trim) {
          val ok =
            if (allowU) term.contains('*') && (term.contains('X') || term.contains('U'))
            else term.contains('*') && term.contains('X')
          if (ok) {
            val parts = psplit(term, "*")
            val coef = parts(0).trim.toDouble
            val varPart = parts(1).trim
            val v = psplit(psplit(varPart, "^")(0), "[")(0)
            val lagPart = psplit(psplit(varPart, "[")(1), "]")(0)
            val lag = if (lagPart == "t") 0 else -psplit(lagPart, "-")(1).toInt
            val key = Vector(v, lag.toString, target)
            if (sum) links(key) = links.getOrElse(key, 0.0) + coef
            else links(key) = coef
          }
        }
      }
    }
    links.iterator.map { case (k, c) => RawLink(k, c) }.toVector
  }

  /** c1.py:248-290: integer variable ids + func tag, positive lag. */
  private def cIntStyle(eqs: Vector[String]): Vector[RawLink] = {
    val links = mutable.LinkedHashMap.empty[Vector[String], Double]
    for (eq <- eqs if eq.contains('=')) {
      val Array(left, right) = psplit(eq, "=") // NOT stripped (c1.py:256)
      val target = psplit(psplit(after(left, "X"), "[")(0), "]")(0).trim.toInt
      for (term0 <- psplit(right, "+"); term = term0.trim if term.contains('X')) {
        val coef = psplit(term, "*")(0).trim.toDouble
        val source = psplit(after(term, "X"), "[")(0).toInt
        val func =
          if (term.contains("cos(")) "cos"
          else if (term.contains("sin(")) "sin"
          else if (term.contains('^')) s"power${psplit(term, "^")(1).trim}"
          else "linear"
        val lag = if (term.contains("[t-")) psplit(psplit(term, "-")(1), "]")(0).toInt else 0
        links(Vector(source.toString, lag.toString, target.toString, func)) = coef
      }
    }
    links.iterator.map { case (k, c) => RawLink(k, c) }.toVector
  }

  /** c1c.py:301-347: name keys, U tagged 'confounder'. */
  private def c1cStyle(eqs: Vector[String]): Vector[RawLink] = {
    val links = mutable.LinkedHashMap.empty[Vector[String], Double]
    for (eq <- eqs if eq.contains('=') && !eq.startsWith("U[")) {
      val Array(left, right) = psplit(eq, "=").map(_.trim)
      val target = s"X${psplit(after(left, "X"), "[")(0).toInt}"
      for (term0 <- psplit(right, "+"); term = term0.trim) {
        if (term.contains('U')) {
          val coef = psplit(term, "*")(0).trim.toDouble
          links(Vector("U", "0", target, "confounder")) = coef
        } else if (term.contains('X')) {
          val coef = psplit(term, "*")(0).trim.toDouble
          val source = s"X${psplit(after(term, "X"), "[")(0).toInt}"
          val func =
            if (term.contains("cos(")) "cos"
            else if (term.contains("sin(")) "sin"
            else if (term.contains('^')) s"power${psplit(term, "^")(1).trim}"
            else "linear"
          val lag = if (term.contains("[t-")) psplit(psplit(term, "-")(1), "]")(0).toInt else 0
          links(Vector(source, lag.toString, target, func)) = coef
        }
      }
    }
    links.iterator.map { case (k, c) => RawLink(k, c) }.toVector
  }

  /** d3c.py:121-169 (also c2c.py:309, d3.py:268): name keys, U func = powerK/linear. */
  private def d3cStyle(eqs: Vector[String]): Vector[RawLink] = {
    val links = mutable.LinkedHashMap.empty[Vector[String], Double]
    for (eq <- eqs if eq.contains('=') && !eq.startsWith("U[")) {
      val Array(left, right) = psplit(eq, "=")
      val target = psplit(left, "[")(0).trim
      for (term0 <- psplit(right, "+"); term = term0.trim) {
        val relevant = (term.contains('X') || term.contains('U')) && !term.startsWith("e")
        if (relevant) {
          val coef = psplit(term, "*")(0).trim.toDouble
          if (term.contains("U[")) {
            val func = if (term.contains('^')) s"power${psplit(term, "^")(1).trim.toInt}" else "linear"
            links(Vector("U", "0", target, func)) = coef
          } else {
            val source = psplit(after(term, "X"), "[")(0)
            val func =
              if (term.contains("cos(")) "cos"
              else if (term.contains("sin(")) "sin"
              else if (term.contains('^')) s"power${psplit(term, "^")(1).trim}"
              else "linear"
            val lag = if (term.contains("[t-")) psplit(psplit(term, "-")(1), "]")(0).toInt else 0
            links(Vector(s"X$source", lag.toString, target, func)) = coef
          }
        }
      }
    }
    links.iterator.map { case (k, c) => RawLink(k, c) }.toVector
  }

  // ---------------------------------------------------------------------------
  // Strict parser (declared semantics — for validation, SURVEY §8.1-2)
  // ---------------------------------------------------------------------------

  /** A declared term under proper +/- splitting: what the equations SAY,
    * including the minus-signed cubic terms the compat extractors drop.
    */
  final case class StrictLink(source: String, lag: Int, target: String,
      func: String, power: Int, coef: Double)

  /** Parse the DECLARED equation semantics: split the rhs on top-level +/-
    * (sign attached to the coefficient), keep every causal term. Diffing
    * against the compat parser surfaces exactly the §2.4-1 dropped terms.
    */
  def strictLinks(family: String, nVars: Int, maxLag: Int): Vector[StrictLink] = {
    val eqs = Catalog.equations((family, nVars, maxLag))
    val out = Vector.newBuilder[StrictLink]
    for (eq <- eqs if eq.contains('=')) {
      val Array(left, right) = psplit(eq, "=").map(_.trim)
      val target = psplit(left, "[")(0)
      if (target != "U") {
        // split on +/- outside parentheses; leading sign belongs to first term
        val terms = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
        var depth = 0; var sign = 1; var cur = new StringBuilder
        right.foreach {
          case c @ ('(' | '[') => depth += 1; cur += c
          case c @ (')' | ']') => depth -= 1; cur += c
          case c @ ('+' | '-') if depth == 0 =>
            if (cur.toString.trim.nonEmpty) terms += ((sign, cur.toString.trim))
            sign = if (c == '-') -1 else 1
            cur = new StringBuilder
          case c => cur += c
        }
        if (cur.toString.trim.nonEmpty) terms += ((sign, cur.toString.trim))

        terms.foreach { case (sg, term) =>
          val causal = (term.contains('X') || term.contains("U[")) &&
            !term.startsWith("trend") && !term.startsWith("season") && term.contains('*')
          if (causal) {
            val parts = psplit(term, "*")
            val coef = sg * parts(0).trim.toDouble
            if (term.contains("U[")) {
              val pow = if (term.contains('^')) psplit(term, "^")(1).trim.toInt else 1
              out += StrictLink("U", 0, target, if (pow == 1) "linear" else s"power$pow", pow, coef)
            } else {
              val src = s"X${psplit(after(term, "X"), "[")(0)}"
              val lag = lagOf(term)
              val (func, pow) =
                if (term.contains("cos(")) ("cos", 1)
                else if (term.contains("sin(")) ("sin", 1)
                else if (term.contains('^')) {
                  val p = psplit(term, "^")(1).trim.takeWhile(_.isDigit).toInt
                  (s"power$p", p)
                } else ("linear", 1)
              out += StrictLink(src, lag, target, func, pow, coef)
            }
          }
        }
      }
    }
    out.result()
  }

  /** Strict-mode generation program (SURVEY §2.4's optional "fixed" mode):
    * identical to [[compileGen]] except that link-extractor families
    * (B/D2, b2.py:160-194) keep EVERY declared term under proper +/-
    * splitting — the minus-signed cubic terms the compat extractor drops
    * re-enter with their declared negative coefficients. All other quirks
    * (U-power dead branch, A2C's empty link set, D1 shadowing, frozen-t)
    * are preserved: strict mode corrects exactly the three declared quirks
    * (cubic, contemporaneous resolution, min_gap), nothing else.
    */
  def compileGenStrict(family: String, nVars: Int, maxLag: Int): GenProgram = {
    val base = compileGen(family, nVars, maxLag)
    if (base.strategy != Strategy.LinkReverse) base
    else {
      val pairs = strictLinks(family, nVars, maxLag).map { sl =>
        val f = sl.func match {
          case "linear" => Func.Linear
          case "cos" => Func.Cos
          case "sin" => Func.Sin
          case _ => Func.Pow
        }
        (GTerm.Dep(sl.source, varIdx(sl.source), sl.source == "U", sl.lag,
          f, sl.power, sl.coef), sl.target)
      }
      linkProgram(family, nVars, maxLag, pairs, Strategy.LinkReverse)
    }
  }

  // ---------------------------------------------------------------------------
  // Generation-side compile (per-family effective semantics)
  // ---------------------------------------------------------------------------

  object Func { val Linear = 0; val Cos = 1; val Sin = 2; val Pow = 3 }

  sealed trait GTerm
  object GTerm {
    case object Noise extends GTerm
    case object Trend extends GTerm
    case object Season extends GTerm
    /** causal dependency term; `func` ∈ Func; `pow` only for Func.Pow. */
    final case class Dep(srcName: String, srcIdx: Int, isU: Boolean, lag: Int,
                         func: Int, pow: Int, coef: Double) extends GTerm
  }

  final case class GenEq(
      targetName: String, targetIdx: Int, terms: Vector[GTerm],
      /** D1 two-pass: true iff no rhs term contains "t]" (d1.py:152). */
      pass1Eligible: Boolean,
      /** name var_values records after pass-1 eval (d1.py:163-169 shadowing quirk). */
      shadowName: String)

  sealed trait Strategy
  object Strategy {
    case object EqReverse extends Strategy     // a1.py:147-192
    case object ListOrder extends Strategy     // c1.py:196-222, d3c.py:333-363
    case object TwoPassShadow extends Strategy // d1.py:136-204
    case object ToposortRetry extends Strategy // a1c.py:160-253
    case object LinkReverse extends Strategy   // b2.py:109-132, b1c.py:111-138
    case object LinkPrePass extends Strategy   // a2.py:169-201
  }

  final case class GenProgram(
      family: String, nVars: Int, maxLag: Int,
      eqs: Vector[GenEq],             // eq-based families, equation-list order (U eq excluded)
      byVar: Array[Vector[GTerm.Dep]], // link-based families: deps per target var idx
      linkTargets: Set[Int],          // link-based: target var idxs (A2 exog pre-pass)
      strategy: Strategy)

  /** Families whose kernel applies U's declared power (B-extractor kernels);
    * C2C/D3C hit the dead `expr == 'U[t]'` branch and apply U LINEARLY despite
    * declaring U^2 (c2c.py:178-186, d3c.py:275-283) — a must-preserve quirk.
    */
  private val uPowerApplied = Set("B1C", "B2C", "D2C")

  def compileGen(family: String, nVars: Int, maxLag: Int): GenProgram = {
    val eqs = Catalog.equations((family, nVars, maxLag))
    family match {
      case "A1"                 => eqProgram(family, nVars, maxLag, eqs, Strategy.EqReverse)
      case "A1C"                => eqProgram(family, nVars, maxLag, eqs, Strategy.ToposortRetry)
      case "D1" | "D1C"         => eqProgram(family, nVars, maxLag, eqs, Strategy.TwoPassShadow)
      case "C1" | "C1C" | "C2" | "C2C" | "D3" | "D3C" =>
        eqProgram(family, nVars, maxLag, eqs, Strategy.ListOrder)
      case "A2" | "A2C" =>
        linkProgram(family, nVars, maxLag, genLinksA(family, eqs), Strategy.LinkPrePass)
      case "B1" | "B1C" | "B2" | "B2C" | "D2" | "D2C" =>
        linkProgram(family, nVars, maxLag, genLinksBPower(eqs), Strategy.LinkReverse)
      case other => throw new IllegalArgumentException(s"unknown family $other")
    }
  }

  /** Generation links for A2 ('noise'-eq filter) / A2C ('e' in rhs filter →
    * ALWAYS empty, a2c.py:226-251: shipped A2C data is pure noise).
    */
  private[core] def genLinksA(family: String, eqs: Vector[String]): Vector[(GTerm.Dep, String)] = {
    val out = mutable.LinkedHashMap.empty[(String, Int, String), Double]
    for (eq <- eqs if eq.contains('=')) {
      val Array(left, right) = psplit(eq, "=").map(_.trim)
      val keep = if (family == "A2C") !right.contains('e') else !eq.contains("noise")
      if (keep) {
        val target = psplit(left, "[")(0)
        for (term0 <- psplit(right, "+"); term = term0.trim)
          if (term.contains('*') && term.contains('X')) {
            val parts = psplit(term, "*").map(_.trim)
            val varPart = parts(1)
            val v = psplit(varPart, "[")(0)
            val lagPart = psplit(psplit(varPart, "[")(1), "]")(0)
            val lag = if (lagPart == "t") 0 else -psplit(lagPart, "-")(1).toInt
            out((v, lag, target)) = parts(0).toDouble
          }
      }
    }
    out.iterator.map { case ((src, lag, tgt), c) =>
      (GTerm.Dep(src, varIdx(src), src == "U", math.abs(lag), Func.Linear, 1, c), tgt)
    }.toVector
  }

  /** b2.py:160-194 / b1c.py:160-202 / d2c.py:266-303: power-aware link dict;
    * only the leading term of "a*X^2 - b*X^3" survives (power '2 - 0.1' →
    * split(' ')[0] → 2; cubic dropped, §2.4-1).
    */
  private[core] def genLinksBPower(eqs: Vector[String]): Vector[(GTerm.Dep, String)] = {
    val out = mutable.LinkedHashMap.empty[(String, Int, String, Int), Double]
    for (eq <- eqs if eq.contains('=')) {
      val Array(left, right) = psplit(eq, "=").map(_.trim)
      val pureNoise = right.contains('e') && psplit(right, "+").length == 1
      if (!pureNoise) {
        val target = psplit(left, "[")(0)
        for (term0 <- psplit(right, "+"); term = term0.trim)
          if (term.contains('*') && (term.contains('X') || term.contains('U'))) {
            val parts = psplit(term, "*")
            val coef = parts(0).trim.toDouble
            val varPart = parts(1).trim
            val baseVar = if (varPart.contains('^')) psplit(varPart, "^")(0) else varPart
            val v = psplit(baseVar, "[")(0)
            val power =
              if (varPart.contains('^')) psplit(psplit(varPart, "^")(1), " ")(0).toInt else 1
            val lagPart = psplit(psplit(baseVar, "[")(1), "]")(0)
            val lag = if (lagPart == "t") 0 else -psplit(lagPart, "-")(1).toInt
            out((v, lag, target, power)) = coef
          }
      }
    }
    out.iterator.map { case ((src, lag, tgt, pow), c) =>
      (GTerm.Dep(src, varIdx(src), src == "U", math.abs(lag),
        if (pow == 1) Func.Linear else Func.Pow, pow, c), tgt)
    }.toVector
  }

  private def varIdx(name: String): Int =
    if (name == "U") -1 else name.drop(1).toInt - 1

  private def linkProgram(family: String, nVars: Int, maxLag: Int,
      pairs: Vector[(GTerm.Dep, String)], strategy: Strategy): GenProgram = {
    val byVar = Array.fill(nVars)(Vector.empty[GTerm.Dep])
    pairs.foreach { case (dep, tgt) =>
      val ti = varIdx(tgt)
      if (ti >= 0 && ti < nVars) byVar(ti) = byVar(ti) :+ dep
    }
    val targets = pairs.map(p => varIdx(p._2)).filter(i => i >= 0 && i < nVars).toSet
    GenProgram(family, nVars, maxLag, Vector.empty, byVar, targets, strategy)
  }

  private def eqProgram(family: String, nVars: Int, maxLag: Int,
      eqs: Vector[String], strategy: Strategy): GenProgram = {
    val genEqs = eqs.flatMap { eq =>
      if (!eq.contains('=') || eq.startsWith("U[")) None
      else {
        val Array(left, right) = psplit(eq, "=").map(_.trim)
        val targetName = psplit(left, "[")(0)
        val targetIdx = varIdx(targetName)
        val rawTerms = psplit(right, "+").map(_.trim).toVector
        var shadow = targetName
        val terms = rawTerms.map { term =>
          if (term.startsWith("e")) GTerm.Noise
          else if (term.startsWith("trend")) GTerm.Trend
          else if (term.startsWith("season")) GTerm.Season
          else {
            val d = parseDepTerm(family, term)
            if (!d.isU) shadow = d.srcName // d1.py:163-169: var_name reassigned per dep term
            d
          }
        }
        val pass1 = !rawTerms.exists(_.contains("t]"))
        Some(GenEq(targetName, targetIdx, terms, pass1, shadow))
      }
    }
    GenProgram(family, nVars, maxLag, genEqs, Array.fill(nVars)(Vector.empty), Set.empty, strategy)
  }

  /** evaluate_term-compatible parse of one dep term (c1.py:143-187,
    * d3c.py:268-331, a1.py:165-189).
    */
  private def parseDepTerm(family: String, term: String): GTerm.Dep = {
    val parts = psplit(term, "*")
    val coef = parts(0).trim.toDouble
    val expr = parts(1).trim
    if (expr.startsWith("U[") || expr.contains("U[t]")) {
      // U is always contemporaneous; C2C/D3C apply it LINEARLY even when the
      // equation declares U^2 (dead `expr == 'U[t]'` branch quirk).
      val pow = if (expr.contains('^') && uPowerApplied(family)) psplit(expr, "^")(1).trim.toInt else 1
      GTerm.Dep("U", -1, isU = true, lag = 0,
        if (pow == 1) Func.Linear else Func.Pow, pow, coef)
    } else if (term.contains("cos(")) {
      val inner = psplit(after(term, "cos("), ")")(0)
      val src = psplit(after(inner, "X"), "[")(0).toInt
      val lag = lagOf(inner)
      GTerm.Dep(s"X$src", src - 1, isU = false, lag, Func.Cos, 1, coef)
    } else if (term.contains("sin(")) {
      val inner = psplit(after(term, "sin("), ")")(0)
      val src = psplit(after(inner, "X"), "[")(0).toInt
      val lag = lagOf(inner)
      GTerm.Dep(s"X$src", src - 1, isU = false, lag, Func.Sin, 1, coef)
    } else if (expr.contains('^')) {
      val pow = psplit(expr, "^")(1).trim.toInt
      val src = psplit(after(expr, "X"), "[")(0).toInt
      val lag = lagOf(expr)
      GTerm.Dep(s"X$src", src - 1, isU = false, lag, Func.Pow, pow, coef)
    } else {
      val src = psplit(after(expr, "X"), "[")(0).toInt
      val lag = lagOf(expr)
      GTerm.Dep(s"X$src", src - 1, isU = false, lag, Func.Linear, 1, coef)
    }
  }

  private def lagOf(s: String): Int =
    if (s.contains("[t-")) psplit(psplit(s, "[t-")(1), "]")(0).toInt else 0
}
