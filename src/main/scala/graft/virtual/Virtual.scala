package graft.virtual

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.types.Cardinality

/** The prelude's ten infinite, generator-backed relations
  * (reference lib/prelude/standard.ml:53-330, registered at server start by
  * lib/system.ml:41-67), re-expressed as *virtual relations*: a fixed
  * attribute list plus a membership predicate compiled to a Column
  * expression. They are never data — the reference enumerates them lazily
  * with Cantor/triangular pairings and gates queries so they are only ever
  * membership-checked; here membership IS the Column predicate, which
  * Catalyst folds into the surrounding plan (a pushed-down filter at any
  * scale, vs. the reference's full-scan membership check).
  *
  * All are relations over naturals, so the membership predicate includes
  * non-negativity of every attribute (the domain check the reference gets
  * from the `natural` domain generator).
  */
final case class VirtualRel(name: String, attrs: List[String], cardinality: Cardinality)(
    pred: Map[String, Column] => Column) {

  /** The tuple at enumeration position n (0-based), reproducing the
    * reference's deterministic generators: triangular indexing for the
    * strict comparisons and Cantor pairing elsewhere (reference
    * lib/prelude/standard.ml:36-51 pair_of_nat_lt / cantor_pair_of_nat,
    * and the per-relation generators at :53-330). Lets `Take n` over a
    * virtual base return the same n tuples the reference's lazy generator
    * yields, instead of failing as unscannable. */
  def tupleAt(n: Long): Map[String, Long] = {
    def pairLt(k: Long): (Long, Long) = { // (left, right) with left < right
      val r = math.floor((1.0 + math.sqrt(1.0 + 8.0 * k)) / 2.0).toLong
      (k - r * (r - 1) / 2, r)
    }
    def cantor(k: Long): (Long, Long) = { // all pairs (a, b)
      val w = math.floor((math.sqrt(8.0 * k + 1.0) - 1.0) / 2.0).toLong
      val b = k - w * (w + 1) / 2
      (w - b, b)
    }
    name match {
      case "natural_natural_less_than" =>
        val (l, r) = pairLt(n); Map("left" -> l, "right" -> r)
      case "natural_natural_less_than_or_equal" =>
        val (a, b) = cantor(n); Map("left" -> math.min(a, b), "right" -> math.max(a, b))
      case "natural_natural_greater_than" =>
        val (l, r) = pairLt(n); Map("left" -> r, "right" -> l)
      case "natural_natural_greater_than_or_equal" =>
        val (a, b) = cantor(n); Map("left" -> math.max(a, b), "right" -> math.min(a, b))
      case "natural_natural_equal" =>
        Map("left" -> n, "right" -> n)
      case "natural_natural_not_equal" =>
        val (a, b) = cantor(n)
        if (a == b) Map("left" -> a, "right" -> (b + 1)) else Map("left" -> a, "right" -> b)
      case "natural_plus" =>
        val (a, b) = cantor(n); Map("a" -> a, "b" -> b, "sum" -> (a + b))
      case "natural_times" =>
        val (a, b) = cantor(n); Map("a" -> a, "b" -> b, "product" -> (a * b))
      case "natural_minus" =>
        val (b, d) = cantor(n); Map("a" -> (b + d), "b" -> b, "difference" -> d)
      case "natural_divide" =>
        val (bIdx, qrIdx) = cantor(n)
        val b = bIdx + 1
        val (q, rRaw) = cantor(qrIdx)
        val r = rRaw % b
        Map("a" -> (b * q + r), "b" -> b, "quotient" -> q, "remainder" -> r)
      case other => throw new IllegalStateException(s"no enumeration for $other")
    }
  }

  /** First n tuples in enumeration order (reference generator drain). */
  def enumerate(n: Int): Seq[Map[String, Long]] = (0L until n.toLong).map(tupleAt)
  /** Membership predicate over a full binding of the relation's attributes. */
  def predicate(binding: Map[String, Column]): Column = {
    val nonNeg = attrs.map(a => binding(a) >= 0).reduce(_ && _)
    nonNeg && pred(binding)
  }

  /** Driver-side ground membership over literal natural values (the ICL
    * check_membership path — no Spark job for a pure arithmetic check).
    * Requires a full, non-negative binding; consistency with the Column
    * predicate is pinned by VirtualSpec. */
  def ground(binding: Map[String, Long]): Boolean =
    attrs.forall(a => binding.get(a).exists(_ >= 0)) && {
      def v(a: String) = binding(a)
      name match {
        case "natural_natural_less_than"             => v("left") < v("right")
        case "natural_natural_less_than_or_equal"    => v("left") <= v("right")
        case "natural_natural_greater_than"          => v("left") > v("right")
        case "natural_natural_greater_than_or_equal" => v("left") >= v("right")
        case "natural_natural_equal"                 => v("left") == v("right")
        case "natural_natural_not_equal"             => v("left") != v("right")
        case "natural_plus"   => v("a") + v("b") == v("sum")
        case "natural_times"  => v("a") * v("b") == v("product")
        case "natural_minus"  => v("b") + v("difference") == v("a")
        case "natural_divide" => v("b") * v("quotient") + v("remainder") == v("a") && v("remainder") < v("b")
        case _ => false
      }
    }
}

object Virtual {
  private def rel(name: String, attrs: String*)(pred: Map[String, Column] => Column) =
    VirtualRel(name, attrs.toList, Cardinality.AlephZero)(pred)

  /** Six comparison relations with schema (left, right)
    * (reference lib/prelude/standard.ml:53-161). */
  val lessThan        = rel("natural_natural_less_than", "left", "right")(b => b("left") < b("right"))
  val lessThanOrEq    = rel("natural_natural_less_than_or_equal", "left", "right")(b => b("left") <= b("right"))
  val greaterThan     = rel("natural_natural_greater_than", "left", "right")(b => b("left") > b("right"))
  val greaterThanOrEq = rel("natural_natural_greater_than_or_equal", "left", "right")(b => b("left") >= b("right"))
  val equalRel        = rel("natural_natural_equal", "left", "right")(b => b("left") === b("right"))
  val notEqualRel     = rel("natural_natural_not_equal", "left", "right")(b => b("left") =!= b("right"))

  /** Four arithmetic relations (reference lib/prelude/standard.ml:163-330). */
  val plus  = rel("natural_plus", "a", "b", "sum")(b => b("a") + b("b") === b("sum"))
  val times = rel("natural_times", "a", "b", "product")(b => b("a") * b("b") === b("product"))
  /** a = b + difference over naturals (defined iff a ≥ b). */
  val minus = rel("natural_minus", "a", "b", "difference")(b => b("b") + b("difference") === b("a"))
  /** a = b·quotient + remainder with 0 ≤ remainder < b
    * (reference lib/prelude/standard.ml:281-330). */
  val divide = rel("natural_divide", "a", "b", "quotient", "remainder") { b =>
    (b("b") * b("quotient") + b("remainder") === b("a")) && (b("remainder") < b("b"))
  }

  val relations: Map[String, VirtualRel] =
    List(lessThan, lessThanOrEq, greaterThan, greaterThanOrEq, equalRel, notEqualRel,
         plus, times, minus, divide).map(r => r.name -> r).toMap

  def isVirtual(name: String): Boolean = relations.contains(name)
}
