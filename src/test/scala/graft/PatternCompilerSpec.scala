package graft

import org.apache.spark.sql.functions._

import graft.expr.PatternCompiler
import graft.model.{ArrayOp, TriplePattern}
import graft.store.TripleStore

/** Compiler goldens mirroring the reference's `TestArrayOpToSQL`
  * (triplestore/triplestore_test.go:143-235) — asserted over an in-memory
  * DataFrame rather than SQL strings, since our compile target is a
  * `Column`.
  */
class PatternCompilerSpec extends SparkSpecBase {
  import ArrayOp.{And, Not, Or}

  private lazy val rows = {
    import spark.implicits._
    Seq(
      ("s1", "p1", "o1", "", "", "", 0L),
      ("s1", "p2", "o2", "en", "", "", 0L),
      ("s2", "p1", "o1", "", "a1", "", 0L),
      ("s2", "p2", "o3", "fr", "a1", "", 0L)
    ).toDF("subj", "pred", "obj", "lang", "author", "sig", "created")
  }

  private def run(op: ArrayOp): Set[(String, String)] =
    rows.filter(PatternCompiler.compile(op)).select("subj", "pred")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("empty pattern matches everything") {
    assert(run(ArrayOp.of(TriplePattern())).size == 4)
  }

  test("single-field and multi-field conjunction per pattern") {
    assert(run(ArrayOp.of(TriplePattern(subj = Some("s1")))) ==
      Set(("s1", "p1"), ("s1", "p2")))
    assert(run(ArrayOp.of(TriplePattern(subj = Some("s1"), pred = Some("p2")))) ==
      Set(("s1", "p2")))
    assert(run(ArrayOp.of(
      TriplePattern(pred = Some("p2"), lang = Some("fr"), author = Some("a1")))) ==
      Set(("s2", "p2")))
  }

  test("bare pattern list is OR (proto3 default mode)") {
    assert(run(ArrayOp.of(
      TriplePattern(subj = Some("s1"), pred = Some("p1")),
      TriplePattern(subj = Some("s2"), pred = Some("p2")))) ==
      Set(("s1", "p1"), ("s2", "p2")))
  }

  test("AND across patterns") {
    assert(run(And(Seq(
      TriplePattern(pred = Some("p1")),
      TriplePattern(obj = Some("o1"))))) ==
      Set(("s1", "p1"), ("s2", "p1")))
    assert(run(And(Seq(
      TriplePattern(subj = Some("s1")),
      TriplePattern(subj = Some("s2"))))).isEmpty)
  }

  test("NOT negates rows; arity enforced") {
    assert(run(Not(Seq(TriplePattern(subj = Some("s1"))))) ==
      Set(("s2", "p1"), ("s2", "p2")))
    intercept[IllegalArgumentException] {
      PatternCompiler.compile(Not(Seq(TriplePattern(subj = Some("s1")),
        TriplePattern(subj = Some("s2")))))
    }
  }

  test("nested ops compose") {
    val op = Or(
      triples = Seq(TriplePattern(obj = Some("o3"))),
      args = Seq(And(Seq(
        TriplePattern(subj = Some("s1")),
        TriplePattern(lang = Some("en"))))))
    assert(run(op) == Set(("s2", "p2"), ("s1", "p2")))
  }

  test("rootSubjects: OR needs all rooted; AND intersects; NOT unroots") {
    val rooted = Or(Seq(
      TriplePattern(subj = Some("a")), TriplePattern(subj = Some("b"))))
    assert(PatternCompiler.rootSubjects(rooted).contains(Set("a", "b")))
    val poisoned = Or(Seq(
      TriplePattern(subj = Some("a")), TriplePattern(pred = Some("p"))))
    assert(PatternCompiler.rootSubjects(poisoned).isEmpty)
    val and = And(Seq(
      TriplePattern(subj = Some("a")), TriplePattern(pred = Some("p"))))
    assert(PatternCompiler.rootSubjects(and).contains(Set("a")))
    assert(PatternCompiler.rootSubjects(
      Not(Seq(TriplePattern(subj = Some("a"))))).isEmpty)
    val nested = And(
      triples = Seq(TriplePattern(pred = Some("p"))),
      args = Seq(Or(Seq(
        TriplePattern(subj = Some("a")), TriplePattern(subj = Some("b"))))))
    assert(PatternCompiler.rootSubjects(nested).contains(Set("a", "b")))
  }

  test("driver-side bucket matches executor-side pmod bucket") {
    import spark.implicits._
    val subjects = Seq("foo", "bar", "/m/02mjmr", "a b c", "", "Ω-unicode")
    val fromSpark = subjects.toDF("subj")
      .select(col("subj"),
        pmod(graft.functions.GraftFunctions.murmur64(col("subj")), lit(64L)).cast("int").as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    subjects.foreach { s =>
      assert(TripleStore.bucketOf(s, 64) == fromSpark(s), s"subject '$s'")
    }
  }
}
