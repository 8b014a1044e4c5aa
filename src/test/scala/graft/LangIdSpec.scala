package graft

import graft.queries.LangId
import org.scalatest.funsuite.AnyFunSuite

/** Language-id heuristic on genuine text samples (the corpus `documents`
  * table is synthetic word-salad, so real-language behavior is pinned
  * here). */
class LangIdSpec extends AnyFunSuite {

  test("detects the four profile languages on natural sentences") {
    assert(LangId.detect("The quick brown fox jumps over the lazy dog and runs to the river for a drink of water.") == "en")
    assert(LangId.detect("Der schnelle braune Fuchs springt über den faulen Hund und das ist nicht schlecht für ein Beispiel.") == "de")
    assert(LangId.detect("Le renard brun rapide saute par-dessus le chien paresseux dans les bois et la rivière est belle.") == "fr")
    assert(LangId.detect("El zorro marrón salta sobre el perro perezoso y los pájaros cantan en el jardín para todos.") == "es")
  }

  test("unknown/empty input -> und") {
    assert(LangId.detect("") == "und")
    assert(LangId.detect(null) == "und")
    assert(LangId.detect("zzz qqq kkk www") == "und")
    assert(LangId.detect("12345 67890 !!!") == "und")
  }

  test("deterministic") {
    val t = "the cat and the dog for a walk in the park"
    assert(LangId.detect(t) == LangId.detect(t))
  }
}
