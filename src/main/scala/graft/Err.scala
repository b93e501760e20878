package graft

import graft.sexp.Sexp
import graft.sexp.Sexp.Atom

/** Typed engine errors — the reference's full wire-error taxonomy,
  * constructed AT THE ORIGIN SITE and rendered to the tagged sexp forms a
  * client pattern-matches (reference `lib/error.ml:3-33` for the
  * `Error.t` constructors; each sublanguage's executor adds its own
  * shapes, `lib/{drl,ddl,dml,icl,scl,dcl}/executor.ml`).
  *
  * Two renderings per error:
  *  - [[sexp]] — the reference's tagged wire form, nested under
  *    `(error ...)` by the listener exactly as `lib/listener.ml:98` does;
  *  - [[message]] — one-line prose for logs, scripts and specs (kept
  *    byte-identical to the strings the engine historically produced, so
  *    nothing downstream of a `.fold(e => fail(s"$e"))` changed).
  *
  * Field-name fidelity: `Error.t` constructors render KEYED payloads
  * (`(relation-not-found (relation r))`, error.ml:23) while the
  * executor-level variants render BARE atoms (`(relation-not-found r)`,
  * e.g. dml/executor.ml:17) — both shapes exist in the reference and both
  * are preserved here ([[Err.RelationNotFound]] vs
  * [[Err.RelationNotFoundBare]]).
  */
sealed trait Err {
  def sexp: Sexp
  def message: String
  override def toString: String = message
}

object Err {
  private def tag(t: String, ps: Sexp*): Sexp = Sexp.SList(Atom(t) :: ps.toList)
  private def kv(k: String, v: Sexp): Sexp = Sexp.list(Atom(k), v)

  // ---- Error.t constructors (lib/error.ml:18-33) ----

  /** `(relation-not-found (relation r))` — manipulation layer. */
  final case class RelationNotFound(relation: String) extends Err {
    def sexp: Sexp = tag("relation-not-found", kv("relation", Atom(relation)))
    def message: String = s"RelationNotFound: $relation"
  }

  /** `(relation-already-exists (relation r))`. */
  final case class RelationAlreadyExists(relation: String) extends Err {
    def sexp: Sexp = tag("relation-already-exists", kv("relation", Atom(relation)))
    def message: String = s"RelationAlreadyExists: $relation"
  }

  /** `(tuple-not-found (hash h))`. */
  final case class TupleNotFound(hash: String) extends Err {
    def sexp: Sexp = tag("tuple-not-found", kv("hash", Atom(hash)))
    def message: String = s"TupleNotFound: $hash"
  }

  /** `(duplicate-tuple (hash h))` — carries the duplicated row's content
    * hash on every path, including the set-wise bulk ones (the digest
    * aggregation surfaces an example duplicate hash at no extra cost). */
  final case class DuplicateTuple(hash: String) extends Err {
    def sexp: Sexp = tag("duplicate-tuple", kv("hash", Atom(hash)))
    def message: String = s"DuplicateTuple: $hash"
  }

  /** `(constraint-violation (message m))`. */
  final case class ConstraintViolation(detail: String) extends Err {
    def sexp: Sexp = tag("constraint-violation", kv("message", Atom(detail)))
    def message: String = s"ConstraintViolation: $detail"
  }

  /** `(storage-error (message m))` — also the honest home for internal
    * invariant failures (the reference routes physical-layer failures
    * here). */
  final case class StorageError(detail: String) extends Err {
    def sexp: Sexp = tag("storage-error", kv("message", Atom(detail)))
    def message: String = s"StorageError: $detail"
  }

  /** `(unrecognized-sublanguage (tag t))` — dispatcher, unknown tag
    * (lib/listener.ml:34). */
  final case class UnrecognizedSublanguage(tagName: String) extends Err {
    def sexp: Sexp = tag("unrecognized-sublanguage", kv("tag", Atom(tagName)))
    def message: String = s"unrecognized sublanguage: $tagName"
  }

  /** `(malformed-expression (expression e))` — request not of the
    * `(tag stmt)` shape and not parseable as any bare statement
    * (lib/listener.ml:45). */
  final case class MalformedExpression(expr: Sexp) extends Err {
    def sexp: Sexp = tag("malformed-expression", kv("expression", expr))
    def message: String = s"malformed expression: ${expr.render}"
  }

  /** `(sublanguage-error (error e))` — every parse/execute failure inside
    * a dispatched sublanguage is wrapped in this at the session boundary
    * (lib/listener.ml:39). Prose stays transparent: the inner message IS
    * the message. */
  final case class SublanguageError(inner: Err) extends Err {
    def sexp: Sexp = tag("sublanguage-error", kv("error", inner.sexp))
    def message: String = inner.message
  }

  /** `(conflict (old-hash o) (new-hash n))` — CAS loss (error.ml:33):
    * old = the stale snapshot the request executed against, new = the
    * state it computed and failed to install. */
  final case class Conflict(oldHash: String, newHash: String) extends Err {
    def sexp: Sexp = tag("conflict",
      kv("old-hash", Atom(oldHash)), kv("new-hash", Atom(newHash)))
    def message: String = s"Conflict: old-hash $oldHash new-hash $newHash"
  }

  /** `(syntax-error (message m))` — the request text failed to lex/parse
    * as a sexp at all (lib/listener.ml:15). */
  final case class SyntaxError(detail: String) extends Err {
    def sexp: Sexp = tag("syntax-error", kv("message", Atom(detail)))
    def message: String = detail
  }

  // ---- executor-level shapes (each sublanguage's own error type) ----

  /** `(parse-error m)` — a well-formed sexp the sublanguage's grammar
    * rejects; also the DRL finiteness-gate rejection (the reference maps
    * gate errors to ParseError, lib/drl/sublanguage.ml:18-19). */
  final case class ParseError(detail: String) extends Err {
    def sexp: Sexp = tag("parse-error", Atom(detail))
    def message: String = detail
  }

  /** `(relation-not-found r)` — the executor-level BARE variant
    * (dml/executor.ml:17, drl/executor.ml:14): a `Base name` that
    * resolves to nothing during query compilation. */
  final case class RelationNotFoundBare(relation: String) extends Err {
    def sexp: Sexp = tag("relation-not-found", Atom(relation))
    def message: String = s"RelationNotFound: $relation"
  }

  /** `(generator-error m)` — DRL runtime/compilation errors beyond name
    * resolution (drl/executor.ml:17): virtual-filter misuse, unknown
    * projection attributes, unbounded windows. */
  final case class GeneratorError(detail: String) extends Err {
    def sexp: Sexp = tag("generator-error", Atom(detail))
    def message: String = detail
  }

  /** `(cursor-error m)` — SCL (scl/executor.ml:28). */
  final case class CursorError(detail: String) extends Err {
    def sexp: Sexp = tag("cursor-error", Atom(detail))
    def message: String = detail
  }

  /** `(branch-not-found b)` — DCL (dcl/executor.ml:20). */
  final case class BranchNotFound(name: String) extends Err {
    def sexp: Sexp = tag("branch-not-found", Atom(name))
    def message: String = s"BranchNotFound: $name"
  }

  /** `(no-database-at-hash h)` — DCL (dcl/executor.ml:21). */
  final case class NoDatabaseAtHash(hash: String) extends Err {
    def sexp: Sexp = tag("no-database-at-hash", Atom(hash))
    def message: String = s"NoDatabaseAtHash: $hash"
  }

  /** `(merge-error e)` — DCL merge failures wrap their cause
    * (dcl/executor.ml:23). */
  final case class MergeError(inner: Err) extends Err {
    def sexp: Sexp = tag("merge-error", inner.sexp)
    def message: String = inner.message
  }

  // ---- repo divergence ----

  /** `(no-database (message m))` — NOT a reference form: the reference
    * boots with a database (bin/server.ml:3-12) so a no-database state is
    * unreachable there, while this server is bootstrapped over the wire.
    * Documented divergence; tagged so clients can still pattern-match. */
  final case class NoDatabase(detail: String) extends Err {
    def sexp: Sexp = tag("no-database", kv("message", Atom(detail)))
    def message: String = s"NoDatabase: $detail"
  }
}
