package graft.report

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.model.SizeRow

/** Result reporting: sort, console table, human units, CSV
  * (reference: src/commands/bench.ts:264-323; src/utils.ts:7-22). */
object Report {

  /** 1024-ladder size formatting (reference: src/utils.ts:7-19). */
  def humanSize(bytes: Long): String = {
    if (bytes == 0) return "0 B"
    val units = Seq("B", "KB", "MB", "GB", "TB")
    var b = bytes.toDouble
    var u = 0
    while (b >= 1024 && u < units.length - 1) { b /= 1024; u += 1 }
    f"$b%.1f ${units(u)}"
  }

  /** Underscore-grouped number (reference: src/utils.ts:21-22). */
  def humanNumber(n: Long): String =
    n.toString.reverse.grouped(3).mkString("_").reverse

  /** Sort by codec then numeric level (reference: bench.ts:265-267). */
  def sorted(rows: Seq[SizeRow]): Seq[SizeRow] = rows.sortBy(r => (r.codec, r.level))

  /** Console table (reference: bench.ts:269-287). */
  def renderTable(rows: Seq[SizeRow]): String = {
    val header = Seq("table_name", "codec", "level", "rows", "data_size", "bytes_per_row") ++
      (if (rows.exists(_.manifest_bytes.isDefined)) Seq("manifest_size", "total_size") else Nil)
    val cells = sorted(rows).map { r =>
      val base = Seq(r.table_name, r.codec, r.level.toString, humanNumber(r.rows),
        humanSize(r.data_bytes), f"${r.bytes_per_row}%.1f")
      (r.manifest_bytes, r.total_bytes) match {
        case (Some(m), Some(t)) => base ++ Seq(humanSize(m), humanSize(t))
        case _                  => base
      }
    }
    val all = header +: cells
    val widths = header.indices.map(i => all.map(r => if (i < r.size) r(i).length else 0).max)
    all
      .map(r => r.zipWithIndex.map { case (c, i) => c.padTo(widths(i), ' ') }.mkString("| ", " | ", " |"))
      .mkString("\n")
  }

  /** CSV writer (reference: bench.ts:289-323). */
  def writeCsv(rows: Seq[SizeRow], file: String): Unit = {
    val withManifest = rows.exists(_.manifest_bytes.isDefined)
    val header = "table_name,codec,level,rows,data_bytes,bytes_per_row" +
      (if (withManifest) ",manifest_bytes,total_bytes" else "")
    val lines = sorted(rows).map { r =>
      val base = s"${r.table_name},${r.codec},${r.level},${r.rows},${r.data_bytes}," +
        f"${r.bytes_per_row}%.2f"
      if (withManifest)
        base + s",${r.manifest_bytes.getOrElse(0L)},${r.total_bytes.getOrElse(r.data_bytes)}"
      else base
    }
    val parent = Paths.get(file).toAbsolutePath.getParent
    if (parent != null) Files.createDirectories(parent)
    Files.write(
      Paths.get(file), (header +: lines).mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
  }

  /** CSV reader with numeric coercion (reference: src/commands/plot.ts:46-73). */
  def readCsv(file: String): Seq[SizeRow] = {
    val lines = Files.readAllLines(Paths.get(file)).toArray(Array.empty[String]).toSeq
    if (lines.isEmpty) return Nil
    val cols = lines.head.split(",").map(_.trim)
    def idx(n: String) = cols.indexOf(n)
    lines.tail.filter(_.nonEmpty).map { l =>
      val f = l.split(",").map(_.trim)
      def get(n: String): Option[String] = idx(n) match {
        case -1 => None
        case i if i < f.length => Some(f(i))
        case _ => None
      }
      // numeric coercion strips grouping chars, like the reference's `toNum`
      // (plot.ts:46-51) — names pass through untouched
      implicit class Num(o: Option[String]) {
        def num: Option[String] = o.map(_.replace("_", "").replace(" ", ""))
      }
      SizeRow(
        table_name = get("table_name").getOrElse(""),
        codec = get("codec").getOrElse(""),
        level = get("level").num.map(_.toInt).getOrElse(0),
        rows = get("rows").num.map(_.toLong).getOrElse(0L),
        data_bytes = get("data_bytes").num.map(_.toLong).getOrElse(0L),
        bytes_per_row = get("bytes_per_row").num.map(_.toDouble).getOrElse(0.0),
        manifest_bytes = get("manifest_bytes").num.map(_.toLong),
        total_bytes = get("total_bytes").num.map(_.toLong)
      )
    }
  }

  /** Minimal SVG bar charts replacing the Chart.js renderer
    * (reference: src/commands/plot.ts:103-198): bytes/row on a linear y-axis,
    * total bytes on a log y-axis, one bar per (codec, level) variant. */
  def renderBarsSvg(rows: Seq[SizeRow], title: String, logScale: Boolean,
      value: SizeRow => Double): String = {
    val data = sorted(rows)
    val labels = data.map(r => f"${r.codec}:l${r.level}%02d")
    val vals = data.map(value)
    val w = math.max(320, 60 * data.size + 80)
    val h = 240
    val maxV = math.max(vals.maxOption.getOrElse(1.0), 1e-9)
    def scale(v: Double): Double =
      if (logScale) math.log1p(v) / math.log1p(maxV) else v / maxV
    val bars = vals.zipWithIndex.map { case (v, i) =>
      val bh = (160 * scale(v)).max(1)
      val x = 60 + i * 60
      f"""<rect x="$x" y="${200 - bh}%.1f" width="40" height="$bh%.1f" fill="#4878d0"/>
         |<text x="${x + 20}" y="215" font-size="9" text-anchor="middle">${labels(i)}</text>
         |<text x="${x + 20}" y="${195 - bh}%.1f" font-size="9" text-anchor="middle">$v%.1f</text>""".stripMargin
    }
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h">
       |<text x="10" y="20" font-size="13">$title</text>
       |${bars.mkString("\n")}
       |</svg>""".stripMargin
  }
}
