package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.{ArrayOp, TriplePattern}
import graft.functions.Murmur3x64

/** Compiles the reference's query algebra to Catalyst `Column`
  * expressions — the Spark-native replacement for the reference's
  * SQL-string generator (reference: triplestore/triplestore.go:79-132,
  * `ArrayOpToSQL`/`TripleToSQL`). Producing a declarative `Column` (rather
  * than strings or hand-rolled plans) lets Catalyst do predicate
  * pushdown, row-group pruning and whole-stage codegen for free.
  */
object PatternCompiler {

  /** Exact-match conjunction over the pattern's *set* fields
    * (reference: triplestore/triplestore.go:110-129 — a field joins the
    * WHERE clause only when non-empty). An all-empty pattern matches
    * everything.
    */
  def compile(p: TriplePattern): Column =
    p.fields
      .collect { case (name, Some(v)) => col(name) === lit(v) }
      .reduceOption(_ && _)
      .getOrElse(lit(true))

  /** Recursive AND/OR/NOT fold (reference:
    * triplestore/triplestore.go:79-105). Operands are the node's leaf
    * patterns followed by its sub-trees. NOT is row-level negation of its
    * single operand (pinned by triplestore_test.go:346-367).
    */
  def compile(op: ArrayOp): Column = {
    val operands = op.triples.map(compile) ++ op.args.map(compile)
    op match {
      case _: ArrayOp.Not =>
        require(operands.size == 1, s"NOT takes exactly 1 operand, got ${operands.size}")
        !operands.head
      case _: ArrayOp.And => operands.reduceOption(_ && _).getOrElse(lit(true))
      case _: ArrayOp.Or  => operands.reduceOption(_ || _).getOrElse(lit(true))
    }
  }

  /** The set of subject literals a query is rooted at, or None if any
    * reachable pattern is subject-free — the reference's shard-routing
    * rule, where one unrooted triple "poisons" the step to a full
    * broadcast (reference: query/query.go:24-47, hash 0 sentinel).
    * Used for driver-side partition pruning: a rooted query only needs
    * the buckets covering `murmur3_64(subj)`.
    */
  def rootSubjects(op: ArrayOp): Option[Set[String]] = {
    val operandRoots: Seq[Option[Set[String]]] =
      op.triples.map(p => p.subj.map(Set(_))) ++ op.args.map(rootSubjects)
    op match {
      // NOT(subj=x) can match any subject: unrooted.
      case _: ArrayOp.Not => None
      // OR: every disjunct must be rooted, result is the union. This is
      // already finer than the reference, which poisons the whole step to
      // a broadcast if ANY pattern anywhere is subject-free
      // (query/query.go:30-44). An EMPTY Or compiles to match-everything,
      // so it must be unrooted — Some(Set.empty) would prune every bucket.
      case _: ArrayOp.Or =>
        if (operandRoots.isEmpty || operandRoots.exists(_.isEmpty)) None
        else Some(operandRoots.flatten.flatten.toSet)
      // AND: any single rooted operand bounds the result (a matching row
      // satisfies all operands) — intersect the known sets.
      case _: ArrayOp.And =>
        operandRoots.flatten.reduceOption(_ intersect _)
    }
  }

  /** Bucket ids (for a store with `numBuckets` partitions) that a rooted
    * query can touch; None ⇒ all buckets (full scan).
    */
  def prunedBuckets(op: ArrayOp, numBuckets: Int): Option[Set[Int]] =
    rootSubjects(op).map(_.map(s =>
      // floorMod == Spark's pmod — must match TripleStore's bucket column.
      math.floorMod(Murmur3x64.hash64(s), numBuckets.toLong).toInt))
}
