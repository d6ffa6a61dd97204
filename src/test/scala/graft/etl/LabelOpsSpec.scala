package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class LabelOpsSpec extends AnyFunSuite {

  test("prefixAvailabilityTypes rewrites headers inside type ranges (P7)") {
    val headers = Seq("A", "B", "C", "D", "E")
    val out = LabelOps.prefixAvailabilityTypes(headers, Seq(
      "Presencial" -> GroupRange(2, 3),
      "Online" -> GroupRange(4, 4)))
    assert(out == Seq("A", "Presencial - B", "Presencial - C", "Online - D", "E"))
  }

  test("plan strict-drops unmapped identificacao headers and dedups collisions") {
    val config = EtlConfig(
      renames = Seq(ColumnRename("Nome da Entidade", "nome_entidade")),
      groups = Map("identificacao" -> GroupRange(1, 3), "formacoes" -> GroupRange(4, 5)))
    val plans = LabelOps.plan(
      Seq("Nome da Entidade", "Ignorado", "Também Ignorado",
        "Curso [X]", "Curso  [X]"), // same label after normalize
      config)
    assert(plans.count(_.group == "identificacao") == 1)
    val f = plans.filter(_.group == "formacoes")
    assert(f.map(_.label) == Seq("x", "x"))
    assert(f.map(_.uniqueName).distinct.size == 2) // collision suffixed
  }

  test("interestLabelOfComment strips bracket and bare suffixes") {
    assert(LabelOps.interestLabelOfComment("lideranca [comentario]", Seq("comentario")) == "lideranca")
    assert(LabelOps.interestLabelOfComment("lideranca[comentario]", Seq("comentario")) == "lideranca")
    assert(LabelOps.interestLabelOfComment("lideranca comentario", Seq("comentario")) == "lideranca")
    assert(LabelOps.interestLabelOfComment("outro rotulo", Seq("comentario")) == "outro rotulo")
  }

  test("Config.fromJson tolerates missing sections") {
    val c = Config.fromJson("""{"config_col_map": {"groups": {"identificacao": {"start": 1, "end": 2}}}}""")
    assert(c.groups == Map("identificacao" -> GroupRange(1, 2)))
    assert(c.renames.isEmpty && c.entityTypes.isEmpty)
    assert(c.keywords.commentKeys == Seq("comentario"))
    assert(c.defaultTipo == "Municípios")
  }
}
