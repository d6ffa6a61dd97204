package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TextNormSpec extends AnyFunSuite {

  // X1 golden pairs — pins unidecode-parity on the Portuguese alphabet
  // (reference applies this to every entity name before the join).
  test("normalize: accents, case, whitespace") {
    assert(TextNorm.normalize("  Município de Águeda ") == "municipio de agueda")
    assert(TextNorm.normalize("SÃO    JOÃO\tdas Lampas") == "sao joao das lampas")
    assert(TextNorm.normalize("Câmara  Municipal X") == "camara municipal x".replace(' ', ' ')
      || TextNorm.normalize("Câmara  Municipal X") == "camara municipal x")
    assert(TextNorm.normalize("ÁÉÍÓÚ ÂÊÔ ÃÕ Ç à è") == "aeiou aeo ao c a e")
    assert(TextNorm.normalize(null) == "")
    assert(TextNorm.normalize("   ") == "")
    assert(TextNorm.normalize("") == "")
  }

  test("normalize is idempotent") {
    val samples = Seq("Município de Águeda", "  x  Y  z ", "", "ção çÃo")
    samples.foreach(s => assert(TextNorm.normalize(TextNorm.normalize(s)) == TextNorm.normalize(s)))
  }

  // X2: prefix stripping happens post-normalization, one designator only.
  test("removePrefixes strips municipality/parish designators") {
    assert(TextNorm.removePrefixes("Município de Águeda") == "agueda")
    assert(TextNorm.removePrefixes("CM  Porto") == "porto")
    assert(TextNorm.removePrefixes("C M Lisboa") == "lisboa")
    assert(TextNorm.removePrefixes("Câmara Municipal do Porto") == "porto")
    assert(TextNorm.removePrefixes("freguesia de santa maria") == "santa maria")
    assert(TextNorm.removePrefixes("União das Freguesias de A e B") == "a e b")
    assert(TextNorm.removePrefixes("Junta de Freguesia dos Olivais") == "olivais")
    // not a prefix -> untouched (after normalize)
    assert(TextNorm.removePrefixes("Hospital de Braga") == "hospital de braga")
    // designator with no following space is not stripped
    assert(TextNorm.removePrefixes("cmx") == "cmx")
  }

  // X3
  test("extractBrackets") {
    assert(TextNorm.extractBrackets("Quantos formandos [Excel Avançado]") == "Excel Avançado")
    assert(TextNorm.extractBrackets("[ a ] [b]") == "a")
    assert(TextNorm.extractBrackets("  sem brackets  ") == "sem brackets")
    assert(TextNorm.extractBrackets("[]") == "")
    assert(TextNorm.extractBrackets(null) == null)
  }

  // X8: lookbehind/lookahead sentence split.
  test("splitSentences") {
    assert(TextNorm.splitSentences("Muito útil. Repetir em 2027!") ==
      Seq("Muito útil.", "Repetir em 2027!"))
    assert(TextNorm.splitSentences("a; b/ c| d") == Seq("a;", "b/", "c|", "d"))
    // the comma delimiter is consumed (no lookbehind on that branch)
    assert(TextNorm.splitSentences("um, Dois, três") == Seq("um", "Dois, três"))
    assert(TextNorm.splitSentences("Ágeis, Ótimos") == Seq("Ágeis", "Ótimos"))
    assert(TextNorm.splitSentences("") == Seq.empty)
    assert(TextNorm.splitSentences(null) == Seq.empty)
    assert(TextNorm.splitSentences("sem pontuacao final") == Seq("sem pontuacao final"))
  }

  test("invalid name sentinels") {
    Seq("", "  ", "nan", "NA", "n/a", "Não Definido", "SEM DADOS", "nd")
      .foreach(s => assert(TextNorm.invalidNames.contains(TextNorm.normalize(s)), s))
    assert(!TextNorm.invalidNames.contains(TextNorm.normalize("Porto")))
  }
}
