package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence properties for the two trickiest algorithms:
  * prefix-filtered AllPairs Jaccard (must equal the naive all-pairs
  * definition) and incremental streaming sessionization (must equal batch
  * gap-splitting for any in-order batch segmentation with arbitrary
  * within-batch disorder).
  */
class AlgoPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("prefix-filtered Jaccard equals the naive all-pairs definition (random corpora with planted dups)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val vocab = (0 until 40).map(i => s"w$i")
      val nBase = 60
      val base = (0 until nBase).map { i =>
        (0 until (5 + rnd.nextInt(20))).map(_ => vocab(rnd.nextInt(vocab.size)))
      }
      // plant near-dups: copy with one token replaced for ~1/3 of docs
      val docs = base.zipWithIndex.flatMap { case (toks, i) =>
        val d = Seq((i.toLong, toks.mkString(" ")))
        if (i % 3 == 0 && toks.size > 4) {
          val mut = toks.updated(rnd.nextInt(toks.size), vocab(rnd.nextInt(vocab.size)))
          d :+ (1000L + i, mut.mkString(" "))
        } else d
      }
      val maxDf = 8L
      val t = 0.5
      val got = graft.text.Dedup.ngramJaccardPairs(
        docs.toDF("doc_id", "text"), "doc_id", "text", n = 3, minJaccard = t, maxDocFreq = maxDf)
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, j) => (a, b) -> j }.toMap

      // naive reference computation in plain Scala
      def shingleSet(text: String): Set[String] = {
        val toks = text.split(" ", -1)
        if (toks.length < 3) Set.empty
        else (0 to toks.length - 3).map(i => toks.slice(i, i + 3).mkString(" ")).toSet
      }
      val all = docs.map { case (id, text) => id -> shingleSet(text) }
      val df = all.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val surviving = all.map { case (id, s) => id -> s.filter(sh => df(sh) <= maxDf) }.toMap
      val ids = docs.map(_._1)
      val want = (for {
        a <- ids; b <- ids if a < b
        sa = surviving(a); sb = surviving(b)
        inter = (sa & sb).size if inter > 0
        j = inter.toDouble / (sa.size + sb.size - inter)
        jr = BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if jr >= t
      } yield (a, b) -> jr).toMap
      assert(got.keySet == want.keySet,
        s"trial $trial pair sets differ: missing=${(want.keySet -- got.keySet).take(3)} extra=${(got.keySet -- want.keySet).take(3)}")
      want.foreach { case (k, j) => assert(math.abs(got(k) - j) < 1e-9, s"trial $trial jaccard at $k") }
    }
  }

  test("containment pairs equal the naive definition on random corpora with planted substrings") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    for (_ <- 1 to 3) {
      val vocab = (0 until 30).map(i => s"t$i")
      val base = (0 until 40).map { i =>
        (0 until (6 + rnd.nextInt(15))).map(_ => vocab(rnd.nextInt(vocab.size)))
      }
      // plant containments: a contiguous slice of a long doc as its own doc
      val docs = base.zipWithIndex.flatMap { case (toks, i) =>
        val d = Seq((i.toLong, toks.mkString(" ")))
        if (i % 4 == 0 && toks.size >= 10) {
          val start = rnd.nextInt(toks.size - 6)
          d :+ (2000L + i, toks.slice(start, start + 6).mkString(" "))
        } else d
      }
      val got = graft.text.Dedup.containmentPairs(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        n = 3, minContainMilli = 700L, maxDocFreq = 10L)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("contain_milli"))
        .toMap

      // naive reference: df-capped shingle sets, all ordered pairs
      def shingleSet(text: String): Set[String] = {
        val toks = text.split(" ", -1)
        if (toks.length < 3) Set.empty
        else (0 to toks.length - 3).map(i => toks.slice(i, i + 3).mkString(" ")).toSet
      }
      val sets0 = docs.map { case (id, text) => id -> shingleSet(text) }
      val df = sets0.flatMap(_._2).groupBy(identity).map { case (s, o) => s -> o.size }
      val sets = sets0.map { case (id, s) => id -> s.filter(df(_) <= 10) }
      val expected = (for {
        (ia, sa) <- sets; (ib, sb) <- sets
        if ia != ib && sa.nonEmpty
        inter = (sa & sb).size
        cm = inter.toLong * 1000 / sa.size
        if cm >= 700
      } yield (ia, ib) -> cm).toMap
      assert(got === expected)
    }
  }

  test("z-order interleave is a bijection and PageRank conserves bounded mass (random graphs)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(99)
    // random 12-bit coordinates: z must be injective and within 24 bits
    val pts = (0 until 500).map(_ => (rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong)).distinct
    val zs = pts.toDF("x", "y")
      .select(graft.ops.ZOrder.zValue(col("x"), col("y"), 12).as("z"))
      .collect().map(_.getLong(0))
    assert(zs.toSet.size === pts.size, "z-order must be injective")
    assert(zs.forall(z => z >= 0 && z < (1L << 24)))
    // random graph: every rank stays in [base, 1e6·|V|] and the fixpoint
    // total never exceeds the uniform start total (floor-div only loses)
    val edges = (0 until 60).map(_ =>
      (s"v${rnd.nextInt(12)}", s"v${rnd.nextInt(12)}", 1L + rnd.nextInt(5)))
      .toDF("src", "dst", "w")
    val ranks = graft.ops.PageRank.rankMicro(edges, iterations = 3)
      .collect().map(_.getLong(1))
    assert(ranks.forall(_ >= 150000L))
    assert(ranks.sum <= 1000000L * ranks.length,
      "floor-division iterations must not create mass")
  }

  test("streaming sessionization equals batch gap-split for random in-order batch segmentations") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 20) {
      val n = 5 + rnd.nextInt(40)
      val ts = Seq.fill(n)((rnd.nextLong() & Long.MaxValue) % 20000000L).sorted
      // random in-order segmentation; shuffle WITHIN each batch (update sorts)
      var rest = ts
      var batches = Vector.empty[Seq[Long]]
      while (rest.nonEmpty) {
        val k = 1 + rnd.nextInt(rest.size)
        batches :+= rnd.shuffle(rest.take(k))
        rest = rest.drop(k)
      }
      checkStreamEqualsBatch(trial, ts, batches, gap = 500000L)
    }
  }

  test("streaming sessionization handles cross-batch stragglers (late lower half of a session)") {
    // deliver a session's UPPER part first, then its lower part together with
    // the NEXT session's events — exercising the straggler/bridge path and
    // the mid-loop close-with-pending-straggler case for random data
    val rnd = new scala.util.Random(19)
    val gap = 500000L
    var exercised = 0
    for (trial <- 1 to 40) {
      val n = 8 + rnd.nextInt(30)
      val ts = Seq.fill(n)((rnd.nextLong() & Long.MaxValue) % 20000000L).sorted.distinct
      // reference sessions as index ranges
      val sessions = ts.foldLeft(Vector.empty[Vector[Long]]) { (acc, t) =>
        acc.lastOption match {
          case Some(s) if t - s.last <= gap => acc.init :+ (s :+ t)
          case _ => acc :+ Vector(t)
        }
      }
      if (sessions.size >= 2 && sessions.exists(_.size >= 2)) {
        val i = sessions.indexWhere(_.size >= 2)
        if (i < sessions.size - 1) {
          exercised += 1
          val split = 1 + rnd.nextInt(sessions(i).size - 1)
          val (lower, upper) = sessions(i).splitAt(split)
          val before = sessions.take(i).flatten
          val after = sessions.drop(i + 2).flatten
          val batches = Vector(
            before ++ upper,                         // session i arrives truncated
            rnd.shuffle(lower ++ sessions(i + 1))    // its lower half arrives LATE,
          ) ++ (if (after.nonEmpty) Vector(after) else Vector.empty) // rest in order
          checkStreamEqualsBatch(trial, ts, batches.filter(_.nonEmpty), gap)
        }
      }
    }
    assert(exercised >= 15, s"straggler scenario under-sampled: $exercised/40")
  }

  private def checkStreamEqualsBatch(trial: Int, ts: Seq[Long],
      batches: Seq[Seq[Long]], gap: Long): Unit = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    import graft.streaming.StreamSession.{Ev, OpenSessions, update}
    var stateOpt: Option[OpenSessions] = None
    var emitted = Vector.empty[(Long, Long, Int)]
    batches.foreach { b =>
      val st = TestGroupState.create[OpenSessions](
        stateOpt.map(Optional.of[OpenSessions]).getOrElse(Optional.empty[OpenSessions]()),
        GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(0L), false)
      val evs = b.map(t => Ev(1L, t, 1.0, new java.sql.Timestamp(t / 1000)))
      emitted ++= update(gap)(1L, evs.iterator, st).map(o => (o.start_us, o.end_us, o.n_events))
      stateOpt = if (st.exists) Some(st.get) else None
    }
    // at watermark 0 nothing may be final — finality means no early emission
    assert(emitted.isEmpty, s"trial $trial: emission at watermark 0: $emitted")
    val finalSessions =
      stateOpt.toVector.flatMap(_.sessions.map(s => (s.startUs, s.lastUs, s.n)))
    val expected = ts.foldLeft(Vector.empty[(Long, Long, Int)]) { (acc, t) =>
      acc.lastOption match {
        case Some((s, e, c)) if t - e <= gap => acc.init :+ (s, t, c + 1)
        case _ => acc :+ (t, t, 1)
      }
    }
    assert(finalSessions.sortBy(_._1) == expected.sortBy(_._1),
      s"trial $trial (batches=${batches.map(_.size)}): got ${finalSessions.sortBy(_._1)} want ${expected.sortBy(_._1)}")
  }

  test("pc orientation equals a reference fixpoint evaluator and is " +
      "partitioning/row-order invariant (random skeletons)") {
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    for (trial <- 1 to 8) {
      // trials 6-8 are denser (7-8 nodes, ~65% edges) so the R2 chain
      // and R3 double-spoke rules fire across more shapes; some dropped
      // pairs get a TWO-element `z~w` sepset (the pcSkeleton2 form the
      // ~-membership collider test must treat as a set)
      val dense = trial > 5
      val nNodes = if (dense) 7 + rnd.nextInt(2) else 4 + rnd.nextInt(3)
      val edgeP = if (dense) 65 else 50
      val nodes = (0 until nNodes).map(i => s"n$i")
      val pairs = for {
        i <- nodes.indices; j <- (i + 1) until nodes.size
      } yield {
        val edge = if (rnd.nextInt(100) < edgeP) 1 else 0
        val others = nodes.patch(j, Nil, 1).patch(i, Nil, 1)
        val sep = if (edge == 1 || rnd.nextBoolean()) None
          else if (dense && rnd.nextBoolean() && others.size >= 2) {
            val z = others(rnd.nextInt(others.size))
            val w = (others.filterNot(_ == z))(
              rnd.nextInt(others.size - 1))
            Some(s"$z~$w")
          } else Some(others(rnd.nextInt(others.size)))
        (nodes(i), nodes(j), sep, edge)
      }
      // reference: plain-Scala v-structures + 3 simultaneous full-Meek
      // (R1+R2+R3) rounds with conflict-cancel (the pinned q332 semantics)
      val und = pairs.collect { case (a, b, _, 1) => (a, b) }.toSet
      def adjacent(x: String, y: String) =
        und(if (x < y) (x, y) else (y, x))
      val sepOf = pairs.collect { case (a, b, s, 0) => (a, b) -> s }.toMap
      def applyCl(dir: Map[(String, String), Int],
          claims: Set[(String, String)]): Map[(String, String), Int] =
        dir.map { case ((a, b), d0) =>
          val cf = claims((a, b)); val cr = claims((b, a))
          (a, b) -> (if (d0 != 0) d0
            else if (cf && !cr) 1 else if (cr && !cf) 2 else 0)
        }
      val vcl = (for {
        (x, z) <- und.toSeq.flatMap(e => Seq(e, e.swap))
        (z2, y) <- und.toSeq.flatMap(e => Seq(e, e.swap))
        if z2 == z && x < y && !adjacent(x, y)
        if sepOf.getOrElse((x, y), None)
          .forall(s => !s.split("~").contains(z))
        cl <- Seq((x, z), (y, z))
      } yield cl).toSet
      var dir = applyCl(und.map(_ -> 0).toMap, vcl)
      for (_ <- 1 to 3) {
        // dir.toSeq FIRST: collect/flatMap on a Map re-key by the tuple's
        // first element and silently drop same-source edges / same-tail
        // orientations (a dd with n0->n1 and n0->n2 would keep one; a uu
        // around a 3-spoke tail kept one spoke and starved R3)
        val dd = dir.toSeq.collect { case ((a, b), 1) => (a, b)
                                     case ((a, b), 2) => (b, a) }.toSet
        val uu = dir.toSeq.collect { case ((a, b), 0) => (a, b) }
          .flatMap(e => Seq(e, e.swap)).toSet
        val r1 = (for {
          (a, z) <- dd; (z2, w) <- uu
          if z2 == z && w != a && !adjacent(a, w)
        } yield (z, w)).toSet
        val r2 = (for {
          (a, c) <- dd; (c2, b) <- dd
          if c2 == c && uu((a, b))
        } yield (a, b)).toSet
        val r3 = (for {
          (t, h) <- uu; (t2, c) <- uu; (t3, d) <- uu
          if t2 == t && t3 == t && c < d && c != h && d != h
          if dd((c, h)) && dd((d, h)) && !adjacent(c, d)
        } yield (t, h)).toSet
        dir = applyCl(dir, r1 ++ r2 ++ r3)
      }
      val skBase = pairs.toDF("a", "b", "sepset", "edge")
      Seq(skBase, skBase.repartition(7), skBase.orderBy($"b".desc))
        .foreach { sk =>
          val got = graft.metrics.Causal.pcOrient(sk, 3)
            .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2))
            .toMap
          assert(got == dir.filter { case (k, _) => und(k) },
            s"trial $trial: got $got want $dir (pairs=$pairs)")
        }
    }
  }
}
