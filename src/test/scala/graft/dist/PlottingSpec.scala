package graft.dist

import graft.SparkSpec

/** SVG rendering of histogram/density frames (the reference's
  * plot_hist/plot_density surface). Asserts structure — the drawing is a
  * pure function of the collected frame, so the bar/line/tick counts and
  * tooltip values pin the geometry without an image diff. */
class PlottingSpec extends SparkSpec {
  import spark.implicits._

  private def twoSeries: Histogram = {
    val a = (1 to 100).map(_.toDouble).toDF("a")
    val b = (40 to 160).map(_.toDouble).toDF("b")
    new Histogram(Bins.Count(10)).addColumn(a, "a").addColumn(b, "b")
  }

  test("svgHistogram: one rounded bar per (bin, series), legend, tooltips") {
    val svg = twoSeries.plotHist(title = "a vs b")
    assert(svg.startsWith("<svg ") && svg.endsWith("</svg>"))
    assert(svg.contains("a vs b"))
    // 10 bins x 2 series bars, each with a native <title> tooltip
    assert("<path d=\"M".r.findAllIn(svg).size == 20)
    assert("<title>".r.findAllIn(svg).size == 20)
    // legend present for 2 series (one swatch rect per series)
    assert("rx=\"2\"".r.findAllIn(svg).size == 2)
    // series colors in fixed order, text never in series color
    assert(svg.contains("#2a78d6") && svg.contains("#eb6834"))
    assert(!svg.contains("""fill="#2a78d6">a<"""))
  }

  test("svgHistogram: single series has no legend; counts reach tooltips") {
    val h = new Histogram(Bins.Count(4))
      .addColumn((1 to 8).map(_.toDouble).toDF("x"), "x")
    val svg = h.plotHist()
    assert(!svg.contains("rx=\"2\"")) // no legend swatch
    // 4 equal bins over 1..8 hold 2 values each
    assert("<title>x \\[[^\\]]*\\]: 2</title>".r.findAllIn(svg).size == 4)
  }

  test("legend wraps to new rows instead of overflowing the right margin") {
    // 8 long-labeled series at default width cannot fit one 22px row;
    // entries must wrap (multiple distinct swatch y values) and every
    // swatch must stay inside the right margin (x + 10 <= width - 16)
    val cols = (0 until 8).map(i => s"series_label_$i")
    val h = cols.foldLeft(new Histogram(Bins.Count(4))) { (acc, c) =>
      acc.addColumn((1 to 8).map(_.toDouble).toDF(c), c)
    }
    val svg = h.plotHist()
    val swatches = """<rect x="(\d+)" y="(\d+)" width="10" height="10" rx="2"""".r
      .findAllMatchIn(svg).map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq
    assert(swatches.size == 8)
    assert(swatches.map(_._2).distinct.size >= 2, "long legend did not wrap")
    assert(swatches.forall(_._1 + 10 <= 640 - 16), "legend entry overflows the margin")
    // plot area moved down by one extra legend row, bars still render
    assert("<path d=\"M".r.findAllIn(svg).size == 4 * 8)
  }

  test("svgDensity: one 2px polyline per series over bin centers") {
    val svg = twoSeries.plotDensity(title = "density")
    assert("<polyline ".r.findAllIn(svg).size == 2)
    assert(svg.contains("stroke-width=\"2\""))
    assert(svg.contains("fill=\"none\""))
  }

  test("more than 8 series is refused, never repainted") {
    val df = (1 to 10).map(_.toDouble).toDF("c")
    val h = new Histogram(Bins.Count(3))
    (0 to 8).foreach(i => h.addColumn(df, "c", s"s$i"))
    val e = intercept[IllegalArgumentException](h.plotHist())
    assert(e.getMessage.contains("fold series or facet"))
  }

  test("overlapping mode: full-width translucent bars with a surface ring") {
    val svg = twoSeries.plotHist(overlapping = true)
    assert("fill-opacity=\"0.6\"".r.findAllIn(svg).size == 20)
    assert(svg.contains("stroke-width=\"2\""))
    // a single overlapping series needs no translucency
    val one = new Histogram(Bins.Count(3))
      .addColumn((1 to 9).map(_.toDouble).toDF("x"), "x")
      .plotHist(overlapping = true)
    assert(!one.contains("fill-opacity"))
  }

  test("y ticks use K/M/B formatting on large counts") {
    assert(Plotting.fmtHuman(1500.0) == "1.5K")
    assert(Plotting.fmtHuman(2000000.0) == "2M")
    assert(Plotting.fmtHuman(3.5e9) == "3.5B")
    assert(Plotting.fmtHuman(999.0) == "999")
  }

  test("niceTicks are 1/2/5-stepped and cover the max") {
    assert(Plotting.niceTicks(97.0) == Seq(0.0, 20.0, 40.0, 60.0, 80.0, 100.0))
    assert(Plotting.niceTicks(4.0) == Seq(0.0, 1.0, 2.0, 3.0, 4.0))
    assert(Plotting.niceTicks(0.0) == Seq(0.0, 1.0))
  }
}
