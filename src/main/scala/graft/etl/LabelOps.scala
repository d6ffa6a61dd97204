package graft.etl

import graft.functions.TextNorm

/** Driver-side label logic (SURVEY.md §2.2, P1-P8). In the reference the
  * column headers are *data* (free-form survey question text), so all of
  * this runs over `df.columns` on the driver — pure Scala, no Spark —
  * exactly like the reference runs it over pandas columns. Kept separate
  * so it is testable without a session.
  */
object LabelOps {

  /** Role of a column inside its group, decided by keyword classification
    * (etl_ui.py:253-261 / 1698-1704).
    */
  sealed trait Role
  case object Identification extends Role
  case object Measure extends Role       // formacoes counts / preferences
  case object Interest extends Role
  case object InterestComment extends Role
  case object InterestFormandos extends Role
  case object Availability extends Role

  /** One planned column: where it came from, what it means, how to call it. */
  final case class ColPlan(
      originalName: String,   // header as ingested
      label: String,          // processed display label (normalized/bracketed)
      uniqueName: String,     // collision-free physical name in the wide frame
      group: String,
      role: Role)

  /** P5+P4: normalize a header then apply the rename map (headers are
    * matched by normalized form; etl_ui.py:73-75).
    */
  def renameLabel(header: String, renameMap: Map[String, String]): Option[String] = {
    val n = TextNorm.normalize(header).trim
    renameMap.get(n)
  }

  /** P2: does a normalized header contain any of the (normalized) keywords? */
  def containsAny(header: String, keywords: Seq[String]): Boolean = {
    val n = TextNorm.normalize(header)
    keywords.exists(k => n.contains(TextNorm.normalize(k)))
  }

  /** P7 (etl_ui.py:1829-1849): prepend the availability type to each
    * header in the given 1-based column ranges: col -> "{tipo} - {col}".
    * Returns the full rewritten header list.
    */
  def prefixAvailabilityTypes(
      headers: Seq[String],
      typeRanges: Seq[(String, GroupRange)]): Seq[String] =
    headers.zipWithIndex.map { case (h, i0) =>
      val pos = i0 + 1
      typeRanges.find { case (_, r) => pos >= r.start && pos <= r.end } match {
        case Some((tipo, _)) => s"$tipo - $h"
        case None => h
      }
    }

  /** P3+P4+P6+P8: plan every column of the wide frame. Positions are
    * 1-based inclusive (etl_ui.py:146-150). Group handling:
    *  - identificacao: strict rename — only mapped columns survive;
    *  - formacoes: label = bracket-extract(normalize(header)) (etl_ui.py:239);
    *  - interesses: 3-way keyword split (comment/formandos/interest);
    *  - disponibilidade / tipo de ensino: label = normalized header.
    * Unlisted positions are dropped (the reference only processes grouped
    * columns).
    */
  def plan(
      headers: Seq[String],
      config: EtlConfig): Seq[ColPlan] = {
    val used = scala.collection.mutable.Set.empty[String]
    def unique(base: String): String = {
      var name = base
      var i = 2
      while (used.contains(name)) { name = s"${base}_$i"; i += 1 }
      used += name
      name
    }
    val out = Seq.newBuilder[ColPlan]
    for ((groupName, range) <- config.groups.toSeq.sortBy(_._2.start)) {
      val cols = headers.zipWithIndex
        .filter { case (_, i0) => i0 + 1 >= range.start && i0 + 1 <= range.end }
        // P2 drop-by-keyword (etl_ui.py:1047-1054): a header containing any
        // configured keyword (normalized comparison) is excluded from the
        // plan. Positions stay pinned to the *original* header list — the
        // group ranges were defined against it.
        .filterNot { case (h, _) => containsAny(h, config.dropKeywords) }
      groupName match {
        case "identificacao" =>
          for ((h, _) <- cols; newName <- renameLabel(h, config.renameMap))
            out += ColPlan(h, newName, unique(newName), groupName, Identification)
        case "formacoes" =>
          for ((h, _) <- cols) {
            val renamed = renameLabel(h, config.renameMap)
              .getOrElse(TextNorm.normalize(h))
            val label = TextNorm.extractBrackets(renamed)
            out += ColPlan(h, label, unique(s"f__$label"), groupName, Measure)
          }
        case "interesses" =>
          for ((h, _) <- cols) {
            val label = renameLabel(h, config.renameMap)
              .getOrElse(TextNorm.normalize(h))
            val role =
              if (containsAny(label, config.keywords.commentKeys)) InterestComment
              else if (containsAny(label, config.keywords.formandoKeys)) InterestFormandos
              else Interest
            val prefix = role match {
              case InterestComment => "ic__"
              case InterestFormandos => "if__"
              case _ => "i__"
            }
            out += ColPlan(h, label, unique(s"$prefix$label"), groupName, role)
          }
        case "disponibilidade" =>
          for ((h, _) <- cols) {
            val label = renameLabel(h, config.renameMap)
              .getOrElse(TextNorm.normalize(h))
            out += ColPlan(h, label, unique(s"d__$label"), groupName, Availability)
          }
        case _ => // tipo de ensino & any custom group: numeric measures
          for ((h, _) <- cols) {
            val label = renameLabel(h, config.renameMap)
              .getOrElse(TextNorm.normalize(h))
            out += ColPlan(h, label, unique(s"p__$label"), groupName, Measure)
          }
      }
    }
    out.result()
  }

  /** M2 pairing rule: the comment column for interest label `x` is the one
    * whose label equals `x[comentario]` modulo an optional space before
    * the bracket (the reference builds the key as `f"{col}[comentario]"`,
    * etl_ui.py:536; headers in the wild carry a space).
    */
  def interestLabelOfComment(commentLabel: String, commentKeys: Seq[String]): String = {
    var s = commentLabel
    for (k <- commentKeys) {
      val kn = TextNorm.normalize(k)
      s = s.replaceAll("\\s*\\[" + java.util.regex.Pattern.quote(kn) + "\\]\\s*$", "")
        .replaceAll("\\s*" + java.util.regex.Pattern.quote(kn) + "\\s*$", "")
    }
    s.trim
  }
}
