package graft.report

/**
 * Dependency-free SVG chart primitives — the rendering layer for the S7/S8
 * chart/report sinks (reference: matplotlib pies/bars `LF:175-222,283-308,
 * 388-430`). This container (and a lean Spark cluster) has no native
 * matplotlib/FPDF analogue, so charts render as standalone SVG/HTML —
 * format divergence (SVG/HTML vs PNG/PDF), content parity: every series,
 * label, percentage and table the reference draws is drawn here.
 *
 * Pure string builders over small per-user data (a handful of categories /
 * months / vendors) — deterministic output, no RNG, no timestamps, so
 * rendered reports are byte-stable across runs and engines.
 */
object Svg {

  private val palette = Vector(
    "#4e79a7", "#f28e2b", "#e15759", "#76b7b2", "#59a14f",
    "#edc948", "#b07aa1", "#ff9da7", "#9c755f", "#bab0ac")

  def color(i: Int): String = palette(((i % palette.size) + palette.size) % palette.size)

  /** Minimal XML escaping for labels. */
  def esc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  private def fmt(d: Double): String = f"$d%.2f"

  /**
   * Pie chart with a legend (label + percentage), like the reference's
   * category pies (`LF:175-222`). `data` must be non-negative; zero-total
   * input renders an empty-state label instead of dividing by zero.
   */
  def pie(data: Seq[(String, Double)], title: String, size: Int = 280): String = {
    val total = data.map(_._2).sum
    val cx = size / 2.0
    val cy = size / 2.0
    val r = size * 0.4
    val slices = new StringBuilder
    if (total <= 0 || data.isEmpty) {
      slices ++= s"""<text x="$cx" y="$cy" text-anchor="middle" font-size="12">no data</text>"""
    } else if (data.size == 1) {
      slices ++= s"""<circle cx="$cx" cy="$cy" r="$r" fill="${color(0)}"/>"""
    } else {
      var angle = -math.Pi / 2 // 12 o'clock start, clockwise — matplotlib default shape
      data.zipWithIndex.foreach { case ((_, v), i) =>
        val sweep = v / total * 2 * math.Pi
        if (sweep >= 2 * math.Pi - 1e-3) {
          // a slice owning ~100% degenerates the arc: with 2-dp coordinate
          // formatting anything within ~1e-3 rad of a full turn rounds the
          // start and end points onto each other and draws nothing — render
          // the full disc instead (the complement is an invisible sliver)
          slices ++= s"""<circle cx="$cx" cy="$cy" r="$r" fill="${color(i)}"/>"""
        } else if (sweep > 0) {
          val x1 = cx + r * math.cos(angle)
          val y1 = cy + r * math.sin(angle)
          val x2 = cx + r * math.cos(angle + sweep)
          val y2 = cy + r * math.sin(angle + sweep)
          val large = if (sweep > math.Pi) 1 else 0
          slices ++=
            s"""<path d="M $cx $cy L ${fmt(x1)} ${fmt(y1)} A ${fmt(r)} ${fmt(r)} 0 $large 1 ${fmt(x2)} ${fmt(y2)} Z" fill="${color(i)}"/>"""
        }
        angle += sweep
      }
    }
    val legend = data.zipWithIndex.map { case ((label, v), i) =>
      val pct = if (total > 0) v / total * 100 else 0.0
      s"""<g transform="translate(${size + 10}, ${20 + i * 18})">""" +
        s"""<rect width="12" height="12" fill="${color(i)}"/>""" +
        s"""<text x="18" y="10" font-size="11">${esc(label)} (${fmt(pct)}%)</text></g>"""
    }.mkString
    wrap(size + 220, size, title, slices.toString + legend)
  }

  /**
   * Vertical bar chart (the monthly-trend bars, `LF:283-308`). Bars are
   * drawn in input order with value labels; y-scale is max-normalized.
   */
  def bars(data: Seq[(String, Double)], title: String, w: Int = 420, h: Int = 240): String = {
    val maxV = data.map(_._2).foldLeft(0.0)(math.max)
    val plotH = h - 50.0
    val bw = if (data.isEmpty) 0.0 else (w - 40).toDouble / data.size
    val body = data.zipWithIndex.map { case ((label, v), i) =>
      val bh = if (maxV > 0) v / maxV * plotH else 0.0
      val x = 20 + i * bw
      val y = 10 + (plotH - bh)
      s"""<rect x="${fmt(x + bw * 0.1)}" y="${fmt(y)}" width="${fmt(bw * 0.8)}" height="${fmt(bh)}" fill="${color(0)}"/>""" +
        s"""<text x="${fmt(x + bw / 2)}" y="${fmt(10 + plotH + 14)}" text-anchor="middle" font-size="10">${esc(label)}</text>""" +
        s"""<text x="${fmt(x + bw / 2)}" y="${fmt(y - 3)}" text-anchor="middle" font-size="9">${fmt(v)}</text>"""
    }.mkString
    wrap(w, h, title, body)
  }

  /**
   * Grouped bars — two series per label (recurring YTD vs projection,
   * `LF:388-430`).
   */
  def groupedBars(
      data: Seq[(String, Double, Double)], seriesA: String, seriesB: String,
      title: String, w: Int = 460, h: Int = 260): String = {
    val maxV = data.flatMap(d => Seq(d._2, d._3)).foldLeft(0.0)(math.max)
    val plotH = h - 60.0
    val gw = if (data.isEmpty) 0.0 else (w - 40).toDouble / data.size
    val body = data.zipWithIndex.map { case ((label, a, b), i) =>
      val x = 20 + i * gw
      def bar(v: Double, off: Double, c: String) = {
        val bh = if (maxV > 0) v / maxV * plotH else 0.0
        s"""<rect x="${fmt(x + off)}" y="${fmt(10 + plotH - bh)}" width="${fmt(gw * 0.35)}" height="${fmt(bh)}" fill="$c"/>"""
      }
      bar(a, gw * 0.1, color(0)) + bar(b, gw * 0.5, color(1)) +
        s"""<text x="${fmt(x + gw / 2)}" y="${fmt(10 + plotH + 14)}" text-anchor="middle" font-size="10">${esc(label)}</text>"""
    }.mkString
    val legend =
      s"""<g transform="translate(20, ${h - 24})"><rect width="12" height="12" fill="${color(0)}"/>""" +
        s"""<text x="18" y="10" font-size="11">${esc(seriesA)}</text>""" +
        s"""<rect x="120" width="12" height="12" fill="${color(1)}"/>""" +
        s"""<text x="138" y="10" font-size="11">${esc(seriesB)}</text></g>"""
    wrap(w, h, title, body + legend)
  }

  /** HTML table (the PDF's top-3 / flagged tables, `LF:315-387`). */
  def table(headers: Seq[String], rows: Seq[Seq[String]], title: String): String = {
    val head = headers.map(hh => s"<th>${esc(hh)}</th>").mkString
    val body = rows.map(r => "<tr>" + r.map(c => s"<td>${esc(c)}</td>").mkString + "</tr>").mkString
    s"""<h3>${esc(title)}</h3><table border="1" cellspacing="0" cellpadding="4">""" +
      s"""<tr>$head</tr>$body</table>"""
  }

  private def wrap(w: Int, h: Int, title: String, body: String): String =
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h">""" +
      s"""<text x="10" y="${h - 6}" font-size="12" font-weight="bold">${esc(title)}</text>$body</svg>"""
}
