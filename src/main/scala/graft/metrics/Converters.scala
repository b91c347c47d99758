package graft.metrics

/** Converters from causal-discovery tool outputs to the common edge-tensor
  * format (R2-R5, helper_funcs/). These operate on tiny per-graph matrices
  * (p·(L+1) ≤ 45), so they are plain Scala; the engine applies them per graph
  * inside Dataset.map when scoring many graphs.
  */
object Converters {

  /** R2 (py_tetrad_helper.py:6-12): "Frequency_2" -> ("Frequency", 2). */
  private val LaggedName = "^(.*)_(\\d+)$".r
  def parseLaggedName(name: String): (String, Int) = name match {
    case LaggedName(base, lag) => (base, lag.toInt)
    case _ => (name, 0)
  }

  /** Tigramite link-string whitelist (tigramite_helper.py:12-29). */
  val AllowedLinkStrings: Set[String] = Set("", "-->", "<--", "o->", "<-o", "o-o")

  def stringChecker(matrix: Array[Array[Array[String]]]): Boolean = {
    val invalid = matrix.flatten.flatten.filterNot(AllowedLinkStrings.contains)
    if (invalid.nonEmpty)
      throw new IllegalArgumentException(s"Invalid strings found: ${invalid.mkString(", ")}")
    true
  }

  /** R4 (tigramite_helper.py:33-90): link strings (N,N,T) → categorical codes.
    * '-->'/'<--' → 1 (directed, orientation resolved), 'o->'/'<-o' → 2,
    * 'o-o' → 3, '' → 0; '<'-strings flip source/target.
    */
  val ScoreDict: Map[String, Int] =
    Map("-->" -> 1, "<--" -> 1, "o->" -> 2, "<-o" -> 2, "" -> 0, "o-o" -> 3)

  def makeCategoricalCausalGraph(graph: Array[Array[Array[String]]]): Array[Array[Array[Int]]] = {
    val n = graph.length
    val t = graph(0)(0).length
    val codes = Array.ofDim[Int](n, n, t)
    for (i <- 0 until n; j <- 0 until n; k <- 0 until t) {
      val s = graph(i)(j)(k).trim
      if (s.nonEmpty) {
        if (!ScoreDict.contains(s)) throw new IllegalArgumentException(s"Unexpected link string: $s")
        if (s.contains('>')) codes(i)(j)(k) = ScoreDict(s)
        else if (s.contains('<')) codes(j)(i)(k) = ScoreDict(s)
        else if (s.contains('o')) codes(i)(j)(k) = ScoreDict(s)
      }
    }
    codes
  }

  /** R5 (tcdf_helper.py:5-37): TCDF delay dict → (graph bool, val float)
    * tensors. Keys are (effectIdx, causeIdx) → delay; scores optional per
    * target.
    */
  def tcdfMakeMatrices(allDelays: Map[(Int, Int), Int], nVars: Int,
      allScores: Map[Int, Map[Int, Double]] = Map.empty):
      (Array[Array[Array[Boolean]]], Array[Array[Array[Double]]]) = {
    val maxDelay = if (allDelays.isEmpty) 0 else allDelays.values.max
    val d = maxDelay + 1
    val graph = Array.ofDim[Boolean](nVars, nVars, d)
    val vals = Array.ofDim[Double](nVars, nVars, d)
    for (((effect, cause), delay) <- allDelays) {
      graph(cause)(effect)(delay) = true
      vals(cause)(effect)(delay) =
        allScores.get(effect).flatMap(_.get(cause)).getOrElse(1.0)
    }
    (graph, vals)
  }

  /** tcdf_helper.py:40-46 (`_to_bool_array`): float score tensor → bool.
    * threshold=None → `a != 0` (NaN counts as an edge, as in NumPy where
    * NaN != 0 is true); threshold=t → `a > t` (NaN > t is false).
    */
  def toBoolArray(arr: Array[Array[Array[Double]]],
      threshold: Option[Double]): Array[Array[Array[Boolean]]] =
    arr.map(_.map(_.map(v => threshold match {
      case None    => v != 0.0
      case Some(t) => v > t
    })))

  /** tcdf_helper.py:49-55 (`_ensure_3d_bool`): accept a 2D or 3D score /
    * bool adjacency, apply the threshold conversion, and promote 2D → 3D
    * with a single trailing lag slice (`b[:, :, np.newaxis]`). Any other
    * rank raises, mirroring the reference's `ValueError`. The AnyRef entry
    * point mirrors the reference's dynamic-ndim dispatch; the typed
    * overloads are the API a Scala caller uses directly.
    */
  def ensure3dBool(arr: Array[Array[Double]],
      threshold: Option[Double]): Array[Array[Array[Boolean]]] =
    arr.map(_.map(v => Array(threshold match {
      case None    => v != 0.0
      case Some(t) => v > t
    })))

  def ensure3dBool(arr: Array[Array[Array[Double]]],
      threshold: Option[Double]): Array[Array[Array[Boolean]]] =
    toBoolArray(arr, threshold)

  def ensure3dBool(arr: AnyRef, threshold: Option[Double]):
      Array[Array[Array[Boolean]]] = arr match {
    // bool input: threshold is ignored, returned as a copy
    // (tcdf_helper.py:42-43)
    case a: Array[Array[Array[Boolean]]] => a.map(_.map(_.clone()))
    case a: Array[Array[Boolean]]        => a.map(_.map(Array(_)))
    case a: Array[Array[Array[Double]]]  => ensure3dBool(a, threshold)
    case a: Array[Array[Double]]         => ensure3dBool(a, threshold)
    case other => throw new IllegalArgumentException(
      s"Adjacency must be 2D or 3D array; got ${other.getClass.getSimpleName}")
  }

  /** Threshold view over `tcdfMakeMatrices`' val tensor: the graph a user
    * gets when scoring raw TCDF score matrices at a cut `t` instead of the
    * delay-dict bool graph (the reference's downstream
    * `_ensure_3d_bool(val_matrix, threshold)` use).
    */
  def tcdfGraphAtThreshold(allDelays: Map[(Int, Int), Int], nVars: Int,
      allScores: Map[Int, Map[Int, Double]], threshold: Option[Double]):
      Array[Array[Array[Boolean]]] =
    toBoolArray(tcdfMakeMatrices(allDelays, nVars, allScores)._2, threshold)

  /** R3 (py_tetrad_helper.py:51-182): Tetrad endpoint matrix → causal tensor.
    * Endpoint codes 0=NULL 1=CIRCLE 2=TAIL 3=ARROW; strict u→v iff
    * (TAIL, ARROW); errors on unknown endpoint pairs, future→past edges, and
    * lag overflow. Returns (tensor, baseOrder, maxLag).
    */
  def adjMatrixToCausalTensor(names: Seq[String], adj: Array[Array[Int]]):
      (Array[Array[Array[Boolean]]], Seq[String], Int) = {
    require(adj.length == names.length && adj.forall(_.length == names.length),
      "adj must be square and match names")
    val Null = 0; val Tail = 2; val Arrow = 3
    val validPairs = Set((Tail, Arrow), (Arrow, Tail), (Null, Null))
    val parsed = names.map(parseLaggedName)
    val maxLag = parsed.map(_._2).max
    val baseOrder = parsed.map(_._1).distinct
    val idxLag = names.indices.map { i =>
      val (b, l) = parsed(i); (baseOrder.indexOf(b), l)
    }
    val p = baseOrder.length
    val tensor = Array.ofDim[Boolean](p, p, maxLag + 1)
    for (u <- names.indices; v <- names.indices) {
      val aUv = adj(u)(v); val aVu = adj(v)(u)
      if (!(aUv == Null && aVu == Null)) {
        if (!validPairs.contains((aUv, aVu)))
          throw new IllegalArgumentException(s"Invalid endpoint code pair: ($aUv, $aVu)")
        if (aUv == Tail && aVu == Arrow) {
          val (srcIdx, srcLag) = idxLag(u)
          val (tgtIdx, tgtLag) = idxLag(v)
          val normalizedLag = srcLag - tgtLag
          if (normalizedLag < 0)
            throw new IllegalArgumentException(
              s"Future->past edge detected: ${names(u)} -> ${names(v)} with normalized_lag=$normalizedLag")
          if (normalizedLag > maxLag)
            throw new IllegalArgumentException(
              s"Normalized lag $normalizedLag for ${names(u)} -> ${names(v)} exceeds max lag $maxLag")
          tensor(srcIdx)(tgtIdx)(normalizedLag) = true
        }
      }
    }
    (tensor, baseOrder, maxLag)
  }

  /** R6 (metrics_helper.py:45-78): numeric codes → boolean directed edges.
    * 1/2 → stored cell; 3 (undirected) → stored cell only (counted once);
    * 4 (bidirected) → both cells; other nonzero → stored cell.
    */
  def toBoolEdges(mat: Array[Array[Array[Int]]]): Array[Array[Array[Boolean]]] = {
    val p = mat.length
    require(mat.forall(_.length == p), "first two dims must be square")
    val l = mat(0)(0).length
    val out = Array.ofDim[Boolean](p, p, l)
    for (i <- 0 until p; j <- 0 until p; k <- 0 until l) {
      mat(i)(j)(k) match {
        case 0 => ()
        case 4 => out(i)(j)(k) = true; out(j)(i)(k) = true
        case _ => out(i)(j)(k) = true
      }
    }
    out
  }

  /** R11 (py_tetrad_helper.py:185-203): human-readable edge list. */
  def prettyPrintTensor(tensor: Array[Array[Array[Boolean]]], baseVars: Seq[String]): Seq[String] = {
    val p = tensor.length
    val l = tensor(0)(0).length - 1
    val edges = for {
      i <- 0 until p; j <- 0 until p; k <- 0 to l
      if tensor(i)(j)(k)
    } yield
      if (k == 0) s"${baseVars(i)}_t -> ${baseVars(j)}_t    (contemporaneous)"
      else s"${baseVars(i)}_{t-$k} -> ${baseVars(j)}_t  (lag $k)"
    if (edges.isEmpty) Seq("No directed edges found under current interpretation.")
    else edges
  }

  /** Local (driver-side) metrics over tiny tensors — exact mirrors of
    * metrics_helper.py:7-43 for converter round-trip tests; the distributed
    * versions live in Metrics.
    */
  def confusionCounts(gt: Array[Array[Array[Boolean]]], pred: Array[Array[Array[Boolean]]]):
      (Int, Int, Int, Int) = {
    var tp = 0; var fp = 0; var fn = 0; var tn = 0
    for (i <- gt.indices; j <- gt(i).indices; k <- gt(i)(j).indices) {
      (gt(i)(j)(k), pred(i)(j)(k)) match {
        case (true, true) => tp += 1
        case (false, true) => fp += 1
        case (true, false) => fn += 1
        case (false, false) => tn += 1
      }
    }
    (tp, fp, fn, tn)
  }

  def shdByXor(gt: Array[Array[Array[Boolean]]], pred: Array[Array[Array[Boolean]]]): Int = {
    var s = 0
    for (i <- gt.indices; j <- gt(i).indices; k <- gt(i)(j).indices)
      if (gt(i)(j)(k) != pred(i)(j)(k)) s += 1
    s
  }

  /** metrics_helper.py:80-138: orientation-aware SHD with self-loop handling. */
  def shdStructural(gt: Array[Array[Array[Boolean]]], pred: Array[Array[Array[Boolean]]]): Int = {
    val p = gt.length
    val l = gt(0)(0).length
    var shd = 0
    for (k <- 0 until l) {
      for (i <- 0 until p; j <- (i + 1) until p) {
        val gtIj = if (gt(i)(j)(k)) 1 else 0
        val gtJi = if (gt(j)(i)(k)) 1 else 0
        val prIj = if (pred(i)(j)(k)) 1 else 0
        val prJi = if (pred(j)(i)(k)) 1 else 0
        var cost = math.abs(gtIj + gtJi - prIj - prJi)
        if (gtIj + gtJi == 1 && prIj + prJi == 1 &&
            ((gtIj == 1 && prJi == 1) || (gtJi == 1 && prIj == 1))) cost += 1
        shd += cost
      }
      for (i <- 0 until p) if (gt(i)(i)(k) != pred(i)(i)(k)) shd += 1
    }
    shd
  }
}
