package graft.generate

import java.awt.{BasicStroke, Color, Graphics2D, RenderingHints}
import java.awt.geom.{Ellipse2D, Line2D, Path2D}
import java.awt.image.BufferedImage
import javax.imageio.ImageIO

/** S5 closure: render the five reference plot products to PNG on the driver
  * from the (already-oracled) PlotReady aggregates — series lines
  * (a1.py:286-295), causal graph (a1.py:272-282), missing-pattern heatmap
  * (d3c.py:487-499), sampling-interval histogram (d3c.py:501-510), and
  * per-variable trend fits (c1.py:390-411).
  *
  * Scale contract: every renderer takes a COLLECTED aggregate of O(plot)
  * rows (strided samples, buckets, per-var fits) — the reduction from
  * arbitrarily large series to plot-sized data happened distributed in
  * PlotReady; a figure is inherently a driver-sized artifact. Pure JDK
  * (Graphics2D + ImageIO), no external plotting dependency.
  */
object PlotSink {

  private val W = 800; private val H = 600
  private val ML = 60; private val MR = 20; private val MT = 34; private val MB = 46

  // matplotlib's default cycle, so re-rendered figures read like the originals
  private val palette = Array(
    new Color(31, 119, 180), new Color(255, 127, 14), new Color(44, 160, 44),
    new Color(214, 39, 40), new Color(148, 103, 189), new Color(140, 86, 75),
    new Color(227, 119, 194), new Color(127, 127, 127))

  private def canvas(): (BufferedImage, Graphics2D) = {
    val img = new BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
      RenderingHints.VALUE_ANTIALIAS_ON)
    g.setColor(Color.WHITE); g.fillRect(0, 0, W, H)
    (img, g)
  }

  private def frame(g: Graphics2D, title: String, xlab: String, ylab: String,
      xmin: Double, xmax: Double, ymin: Double, ymax: Double): Unit = {
    g.setColor(Color.BLACK)
    g.drawRect(ML, MT, W - ML - MR, H - MT - MB)
    g.drawString(title, ML, MT - 12)
    g.drawString(xlab, (W - MR + ML) / 2 - 20, H - 12)
    g.drawString(ylab, 6, MT - 12)
    // min/max tick labels keep the figure quantitatively readable
    g.drawString(f"$xmin%.3g", ML - 4, H - MB + 16)
    g.drawString(f"$xmax%.3g", W - MR - 40, H - MB + 16)
    g.drawString(f"$ymin%.3g", 8, H - MB)
    g.drawString(f"$ymax%.3g", 8, MT + 12)
  }

  private def span(lo: Double, hi: Double): Double = math.max(1e-12, hi - lo)
  private def sx(x: Double, xmin: Double, xmax: Double): Int =
    ML + ((x - xmin) / span(xmin, xmax) * (W - ML - MR)).toInt
  private def sy(y: Double, ymin: Double, ymax: Double): Int =
    H - MB - ((y - ymin) / span(ymin, ymax) * (H - MT - MB)).toInt

  private def write(img: BufferedImage, path: String): Unit = {
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    ImageIO.write(img, "png", f)
    ()
  }

  /** Series line plot: one polyline per variable over (time, value) samples
    * — the figure a1.py:286-295 draws per config.
    */
  def series(points: Seq[(String, Double, Double)], title: String,
      path: String): Unit = {
    val (img, g) = canvas()
    if (points.nonEmpty) {
      val xs = points.map(_._2); val ys = points.map(_._3)
      val (x0, x1, y0, y1) = (xs.min, xs.max, ys.min, ys.max)
      frame(g, title, "time", "value", x0, x1, y0, y1)
      g.setStroke(new BasicStroke(1.4f))
      for (((v, pts), i) <- points.groupBy(_._1).toSeq.sortBy(_._1).zipWithIndex) {
        g.setColor(palette(i % palette.length))
        val sorted = pts.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Seq((_, xa, ya), (_, xb, yb)) =>
            g.draw(new Line2D.Double(sx(xa, x0, x1).toDouble, sy(ya, y0, y1).toDouble,
              sx(xb, x0, x1).toDouble, sy(yb, y0, y1).toDouble))
          case _ => ()
        }
        g.drawString(v, W - MR - 40, MT + 16 + 14 * i)
      }
    }
    g.dispose(); write(img, path)
  }

  /** Causal-graph plot (a1.py:272-282's networkx circular layout): nodes on
    * a circle, one arrow per link labeled with its lag.
    */
  def causalGraph(nodes: Seq[String], links: Seq[(String, Int, String)],
      title: String, path: String): Unit = {
    val (img, g) = canvas()
    g.setColor(Color.BLACK); g.drawString(title, ML, MT - 12)
    val cx = W / 2.0; val cy = H / 2.0; val r = math.min(W, H) / 2.0 - 80
    val pos = nodes.zipWithIndex.map { case (n, i) =>
      val a = 2 * math.Pi * i / math.max(1, nodes.size)
      n -> ((cx + r * math.cos(a), cy + r * math.sin(a)))
    }.toMap
    g.setStroke(new BasicStroke(1.2f))
    for ((src, lag, tgt) <- links; (xa, ya) <- pos.get(src); (xb, yb) <- pos.get(tgt)) {
      g.setColor(new Color(60, 60, 60))
      if (src == tgt) { // self-loop: small circle tangent to the node
        g.draw(new Ellipse2D.Double(xa + 14, ya - 34, 28, 28))
      } else {
        g.draw(new Line2D.Double(xa, ya, xb, yb))
        // arrowhead at 85% along the edge
        val (mx, my) = (xa + (xb - xa) * 0.85, ya + (yb - ya) * 0.85)
        val ang = math.atan2(yb - ya, xb - xa)
        val head = new Path2D.Double()
        head.moveTo(mx, my)
        head.lineTo(mx - 10 * math.cos(ang - 0.4), my - 10 * math.sin(ang - 0.4))
        head.lineTo(mx - 10 * math.cos(ang + 0.4), my - 10 * math.sin(ang + 0.4))
        head.closePath(); g.fill(head)
      }
      g.drawString(s"lag $lag", ((xa + xb) / 2).toInt + 4, ((ya + yb) / 2).toInt - 4)
    }
    for ((n, (x, y)) <- pos) {
      g.setColor(new Color(173, 216, 230))
      g.fill(new Ellipse2D.Double(x - 18, y - 18, 36, 36))
      g.setColor(Color.BLACK)
      g.draw(new Ellipse2D.Double(x - 18, y - 18, 36, 36))
      g.drawString(n, x.toInt - 8, y.toInt + 4)
    }
    g.dispose(); write(img, path)
  }

  /** Missing-pattern heatmap (d3c.py:487-499): variables × time-buckets grid
    * shaded by missing fraction.
    */
  def missingPattern(cells: Seq[(String, Long, Long, Long)], title: String,
      path: String): Unit = {
    val (img, g) = canvas()
    if (cells.nonEmpty) {
      val vars = cells.map(_._1).distinct.sorted
      val buckets = cells.map(_._2).distinct.sorted
      frame(g, title, "time bucket", "variable",
        buckets.head.toDouble, buckets.last.toDouble, 0, vars.size.toDouble)
      val cw = (W - ML - MR).toDouble / buckets.size
      val ch = (H - MT - MB).toDouble / vars.size
      val bIdx = buckets.zipWithIndex.toMap
      val vIdx = vars.zipWithIndex.toMap
      for ((v, b, nMiss, nTot) <- cells) {
        val frac = if (nTot == 0) 0.0 else nMiss.toDouble / nTot
        // white → matplotlib-red ramp
        val c = new Color(255, (255 * (1 - frac) * 0.85 + 38).toInt.min(255),
          (255 * (1 - frac) * 0.85 + 40).toInt.min(255))
        g.setColor(c)
        g.fillRect((ML + bIdx(b) * cw).toInt, (MT + vIdx(v) * ch).toInt,
          math.ceil(cw).toInt, math.ceil(ch).toInt)
      }
      g.setColor(Color.BLACK)
      for (v <- vars) g.drawString(v, 8, (MT + (vIdx(v) + 0.6) * ch).toInt)
      g.drawRect(ML, MT, W - ML - MR, H - MT - MB)
    }
    g.dispose(); write(img, path)
  }

  /** Sampling-interval histogram (d3c.py:501-510): bars over (bin_lo, n). */
  def histogram(bars: Seq[(Double, Long)], binWidth: Double, title: String,
      path: String): Unit = {
    val (img, g) = canvas()
    if (bars.nonEmpty) {
      val x0 = bars.map(_._1).min; val x1 = bars.map(_._1).max + binWidth
      val y1 = bars.map(_._2).max.toDouble
      frame(g, title, "interval", "count", x0, x1, 0, y1)
      g.setColor(palette(0))
      for ((lo, n) <- bars) {
        val xa = sx(lo, x0, x1); val xb = sx(lo + binWidth, x0, x1)
        val yt = sy(n.toDouble, 0, y1)
        g.fillRect(xa + 1, yt, math.max(1, xb - xa - 2), H - MB - yt)
      }
    }
    g.dispose(); write(img, path)
  }

  /** Trend-fit plot (c1.py:390-411): strided value scatter per variable plus
    * its fitted line from (slope, intercept) in milli units.
    */
  def trend(points: Seq[(String, Double, Double)],
      fitsMilli: Map[String, (Long, Long)], title: String, path: String): Unit = {
    val (img, g) = canvas()
    if (points.nonEmpty) {
      val xs = points.map(_._2); val ys = points.map(_._3)
      val (x0, x1, y0, y1) = (xs.min, xs.max, ys.min, ys.max)
      frame(g, title, "time", "value", x0, x1, y0, y1)
      for (((v, pts), i) <- points.groupBy(_._1).toSeq.sortBy(_._1).zipWithIndex) {
        g.setColor(palette(i % palette.length))
        for ((_, x, y) <- pts)
          g.fill(new Ellipse2D.Double(sx(x, x0, x1) - 1.5, sy(y, y0, y1) - 1.5, 3, 3))
        for ((sm, im) <- fitsMilli.get(v)) {
          val (s, c) = (sm / 1000.0, im / 1000.0)
          g.setStroke(new BasicStroke(2f))
          g.draw(new Line2D.Double(sx(x0, x0, x1).toDouble, sy(s * x0 + c, y0, y1).toDouble,
            sx(x1, x0, x1).toDouble, sy(s * x1 + c, y0, y1).toDouble))
          g.setStroke(new BasicStroke(1f))
        }
        g.drawString(v, W - MR - 40, MT + 16 + 14 * i)
      }
    }
    g.dispose(); write(img, path)
  }
}
