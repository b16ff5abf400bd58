package graft.engine

/** Column-width-aligned ASCII table of a resultset (reference E23
  * print_table, dbccore.py:39-48: pipe-separated cells padded to the
  * column max, a dashed rule under the header). Golden-output parity
  * target for packet logs. */
object ResultRenderer {

  def printTable(rs: ResultSet): String = {
    val table: Seq[Seq[String]] =
      rs.columns.map(String.valueOf(_)) +:
        rs.rows.map(_.map(v => String.valueOf(v)))
    if (table.head.isEmpty) return ""
    val widths = table.head.indices.map { i =>
      table.map(r => if (i < r.size) r(i).length else 0).max
    }
    val rendered = table.zipWithIndex.map { case (row, idx) =>
      val line = row.zipWithIndex
        .map { case (cell, i) => cell.padTo(widths(i), ' ') }
        .mkString("| ", " | ", " |")
      // reference draws the rule under the first row (the header)
      if (idx == 0) line + "\n" + "-" * line.length else line
    }
    rendered.mkString("\n")
  }
}
