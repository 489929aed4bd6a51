package graft.query

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/**
 * Boolean query language over the postings table — AND / OR / NOT with
 * parentheses, parsed shunting-yard style into RPN and evaluated as a
 * semi/union/anti join plan.
 *
 * Ported semantics (NOT code) from
 * /root/reference/pkg/searcher/boolean_query.go:
 *  - precedences NOT(3) > AND(2) > OR(1), parens group (:43-101);
 *  - operators are INFIX and pop while strictly lower precedence (equal
 *    precedence does not pop — right-associative, reproduced as-is);
 *  - evaluation walks the RPN with a postings stack (:104-148). The
 *    reference implements only AND (posting-list intersection, :150-167);
 *    OR and NOT are declared but "NOT IMPLEMENTED YET" (:135-141) —
 *    completed here as union-distinct and anti-join, consistent with the
 *    round-1 so2_or_not completion.
 *
 * Each term resolves to its doc-id posting list via an `isin`-style term
 * filter on the postings table (term-prunable at scale); the plan composes
 * left_semi / union / left_anti joins, so Catalyst sees one declarative
 * tree and the whole evaluation is a single job.
 */
object BooleanQuery {

  sealed trait Tok
  case class TermTok(t: String) extends Tok
  case object AndTok extends Tok
  case object OrTok extends Tok
  case object NotTok extends Tok
  case object LParen extends Tok
  case object RParen extends Tok

  private val prec: Map[Tok, Int] =
    Map(AndTok -> 2, LParen -> 0, RParen -> 0, OrTok -> 1, NotTok -> 3)

  def tokenize(query: String): Seq[Tok] =
    query.replace("(", " ( ").replace(")", " ) ")
      .split("\\s+").toSeq.filter(_.nonEmpty).map {
        case "AND" => AndTok
        case "OR" => OrTok
        case "NOT" => NotTok
        case "(" => LParen
        case ")" => RParen
        case w => TermTok(Tokenizer.tokenize(w).headOption.getOrElse(""))
      }

  /** Shunting-yard to RPN (boolean_query.go:43-101, 1:1 pop behavior). */
  def toRpn(tokens: Seq[Tok]): Seq[Tok] = {
    val output = scala.collection.mutable.ArrayBuffer.empty[Tok]
    var stack = List.empty[Tok]
    tokens.foreach {
      case LParen => stack = LParen :: stack
      case RParen =>
        while (stack.nonEmpty && stack.head != LParen) {
          output += stack.head; stack = stack.tail
        }
        require(stack.nonEmpty, s"unbalanced ')' in boolean query")
        stack = stack.tail // drop '('
      case op if prec.contains(op) =>
        while (stack.nonEmpty && prec(op) < prec(stack.head)) {
          output += stack.head; stack = stack.tail
        }
        stack = op :: stack
      case term => output += term
    }
    stack.foreach { t => require(t != LParen, "unbalanced '(' in boolean query"); output += t }
    output.toSeq
  }

  /** Evaluate the RPN over a postings table (term, doc_id, ...): returns a
   *  single-column (doc_id) DataFrame (boolean_query.go:104-148 recast as a
   *  join plan). */
  def eval(postings: DataFrame, query: String): DataFrame = {
    val rpn = toRpn(tokenize(query))
    var stack = List.empty[DataFrame]
    def pop2(): (DataFrame, DataFrame) = {
      require(stack.size >= 2, s"malformed boolean query: '$query'")
      val right = stack.head; val left = stack.tail.head
      stack = stack.tail.tail
      (left, right)
    }
    rpn.foreach {
      case TermTok(t) =>
        stack = postings.filter(col("term") === t).select("doc_id") :: stack
      case AndTok =>
        val (l, r) = pop2()
        stack = l.join(r, Seq("doc_id"), "left_semi") :: stack
      case OrTok =>
        val (l, r) = pop2()
        stack = l.union(r).distinct() :: stack
      case NotTok =>
        val (l, r) = pop2()
        stack = l.join(r, Seq("doc_id"), "left_anti") :: stack
      case other => throw new IllegalArgumentException(s"unexpected token $other")
    }
    require(stack.size == 1, s"malformed boolean query: '$query'")
    stack.head
  }
}
