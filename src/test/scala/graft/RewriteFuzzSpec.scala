package graft

import graft.ksql.Translator
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz for the dialect's quote-aware expression rewriter: the
  * rewrite pipeline must (1) never throw on structurally valid input,
  * (2) be idempotent — a rewritten expression contains no KSQL names,
  * so a second pass is identity, and (3) preserve every single-quoted
  * literal — function-name lookalikes INSIDE strings must survive
  * verbatim (expansions may duplicate an argument, so presence, not
  * count, is the invariant). 500 deterministic samples (fixed seed). */
class RewriteFuzzSpec extends AnyFunSuite {

  private val ident = Gen.oneOf("x", "y", "col1", "event_type", "value")
  private val number = Gen.choose(0, 999).map(_.toString)
  // literals that look like rewritable calls, plus '' escapes, plus
  // arrow/assign lookalikes that the lambda and constructor passes must
  // never touch inside strings
  private val literal = Gen.oneOf(
    "'MASK(x)'", "'see UCASE(b'", "'a''b'", "'plain text'",
    "'GEO_DISTANCE(1,2,3,4)'", "'field, elt'", "'a => b'", "'k := v'",
    "'TRANSFORM(m)'", "'CAST(a AS VARCHAR)'")
  // TIMEADD/TIMESUB stay out for the same reason TIMESTAMPADD/DATEADD
  // do: their first argument is a bare TimeUnit identifier the rewrite
  // consumes, so an arbitrary fuzz expression there isn't structurally
  // valid input (the wrap property fuzz covers their semantics)
  private val fnName = Gen.oneOf(
    "UCASE", "LCASE", "LEN", "TRIM", "IFNULL", "MASK", "MASK_LEFT",
    "MASK_KEEP_RIGHT", "FIELD", "ELT", "CONCAT_WS", "GEO_DISTANCE",
    "STRINGTOTIMESTAMP", "TIMESTAMPTOSTRING", "URL_EXTRACT_HOST",
    "LATEST_BY_OFFSET", "TOPK", "HISTOGRAM", "ROUND", "ABS",
    "ARRAY_SORT", "IS_JSON_STRING", "ARRAY_CONCAT", "SPLIT_TO_MAP",
    "PARSE_TIME", "FORMAT_TIME")

  private def exprGen(depth: Int): Gen[String] =
    if (depth <= 0) Gen.oneOf(ident, number, literal)
    else Gen.frequency(
      2 -> ident, 1 -> number, 2 -> literal,
      4 -> (for {
        name <- fnName
        n <- Gen.choose(1, 4)
        args <- Gen.listOfN(n, exprGen(depth - 1))
      } yield s"$name(${args.mkString(", ")})"),
      // ksqlDB HOFs with lambda args (single- and two-param arrows)
      1 -> (for {
        hof <- Gen.oneOf("TRANSFORM", "FILTER")
        arr <- exprGen(depth - 1); body <- exprGen(depth - 1)
      } yield s"$hof($arr, w => $body)"),
      1 -> (for {
        arr <- exprGen(depth - 1); init <- Gen.oneOf(ident, number)
        body <- exprGen(depth - 1)
      } yield s"REDUCE($arr, $init, (acc, w) => $body)"),
      1 -> (for {
        a <- exprGen(depth - 1); b <- exprGen(depth - 1)
      } yield s"$a + $b"),
      // the bare-VARCHAR type token (round 18): rewrites to STRING
      // outside quotes, survives verbatim inside them
      1 -> exprGen(depth - 1).map(e => s"CAST($e AS VARCHAR)"))

  /** quoted-literal contents, honoring '' escapes (same scan discipline
    * as the rewriter's). */
  private def literalSpans(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\'') {
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < s.length && !closed) {
          if (s.charAt(i) == '\'') {
            if (i + 1 < s.length && s.charAt(i + 1) == '\'') { sb.append("''"); i += 2 }
            else { closed = true; i += 1 }
          } else { sb.append(s.charAt(i)); i += 1 }
        }
        out += sb.toString
      } else i += 1
    }
    out.result()
  }

  test("rewriteExpr: total, idempotent, literal-preserving over 500 fuzz samples") {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    var checked = 0
    while (checked < 500) {
      val e = exprGen(3).pureApply(params, seed)
      seed = seed.next
      // arity errors are legitimate rejections (e.g. MASK with 3 args);
      // anything else thrown is a rewriter bug
      val rewritten =
        try Some(Translator.rewriteExpr(e))
        catch { case _: IllegalArgumentException => None }
      rewritten.foreach { r =>
        assert(Translator.rewriteExpr(r) == r, s"not idempotent on <$e> -> <$r>")
        val inLits = literalSpans(e).toSet
        val outLits = literalSpans(r).toSet
        inLits.foreach(l => assert(outLits.contains(l),
          s"literal <$l> lost rewriting <$e> -> <$r>"))
        checked += 1
      }
    }
  }
}
