package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sentences

/** Sentence-splitter invariants: plain splits on all three
  * terminators, abbreviation/initial/decimal protection, ellipsis
  * runs, terminator-free tails, and empties. Pure JVM. */
class SentencesSpec extends AnyFunSuite {

  test("plain sentences split on ., !, and ?") {
    assert(Sentences.split("One here. Two there! Three now? Four.") ==
      Seq("One here.", "Two there!", "Three now?", "Four."))
  }

  test("abbreviations, initials, and decimals never split") {
    assert(Sentences.split("Dr. Smith met Mrs. Jones near St. Paul at 3.5 km. Next one.") ==
      Seq("Dr. Smith met Mrs. Jones near St. Paul at 3.5 km.", "Next one."))
    assert(Sentences.split("J. K. Rowling wrote e.g. seven books. The end.") ==
      Seq("J. K. Rowling wrote e.g. seven books.", "The end."))
    assert(Sentences.split("Revenue grew 3.5 percent. Costs fell.") ==
      Seq("Revenue grew 3.5 percent.", "Costs fell."))
  }

  test("a break needs whitespace AND an opener after the terminator") {
    // lowercase continuation: not a new sentence
    assert(Sentences.split("it was v. strange but true. done") ==
      Seq("it was v. strange but true. done"))
    // opener can be a digit or a quote
    assert(Sentences.split("Count them. 7 geese flew.") ==
      Seq("Count them.", "7 geese flew."))
    assert(Sentences.split("He left. \"Stay,\" she said.") ==
      Seq("He left.", "\"Stay,\" she said."))
  }

  test("ellipsis and stacked terminators close once") {
    assert(Sentences.split("Wait... Now go! Really?! Sure.") ==
      Seq("Wait...", "Now go!", "Really?!", "Sure."))
  }

  test("terminator-free tails, empties, and nulls behave") {
    assert(Sentences.split("No terminator here") == Seq("No terminator here"))
    assert(Sentences.split("Done. trailing words") == Seq("Done. trailing words"))
    assert(Sentences.split("") == Nil)
    assert(Sentences.split("   ") == Nil)
    assert(Sentences.split(null) == Nil)
  }
}
