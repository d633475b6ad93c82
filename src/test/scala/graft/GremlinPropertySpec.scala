package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, rng}
import graft.graph.{GremlinParser => GP, P}
import graft.graph.GremlinParser._

/** Property test for the Gremlin string front-end: for randomly
  * generated ASTs covering every verb and predicate, rendering to
  * query text and re-parsing is the IDENTITY — the grammar and the
  * parser cannot drift apart without this failing. Deterministic
  * seeds (the DedupSpec pureApply pattern) so failures reproduce.
  */
class GremlinPropertySpec extends AnyFunSuite {

  private val ident: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private val scalar: Gen[Any] = Gen.oneOf(
    Gen.chooseNum(-1000000L, 1000000L),
    // plain-decimal doubles only: the tokenizer (like Gremlin's) has
    // no exponent notation
    Gen.chooseNum(-9999L, 9999L).map(n => n / 8.0),
    ident,
    Gen.oneOf(true, false))

  private val predicate: Gen[P] = Gen.oneOf(
    scalar.map(P.Eq), scalar.map(P.Neq), scalar.map(P.Gt),
    scalar.map(P.Gte), scalar.map(P.Lt), scalar.map(P.Lte),
    Gen.zip(scalar, scalar).map { case (a, b) => P.Between(a, b) },
    Gen.zip(scalar, scalar).map { case (a, b) => P.Inside(a, b) },
    Gen.zip(scalar, scalar).map { case (a, b) => P.Outside(a, b) },
    Gen.nonEmptyListOf(scalar).map(P.Within(_)),
    Gen.nonEmptyListOf(scalar).map(P.Without(_)),
    ident.map(P.TextContains), ident.map(P.StartsWith),
    ident.map(P.EndsWith), ident.map(P.NotStartsWith),
    ident.map(P.NotEndsWith), ident.map(P.NotTextContains),
    scalar.map(P.Contains), ident.map(P.ContainsKey),
    Gen.nonEmptyListOf(ident).map(P.TextContainsAny(_)))

  private val labels: Gen[Seq[String]] =
    Gen.chooseNum(0, 3).flatMap(n => Gen.listOfN(n, ident))
  private val labels1: Gen[Seq[String]] =
    Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, ident))

  /** chainable (non-terminal, non-source) steps; depth bounds nesting */
  private def chainStep(depth: Int): Gen[GStep] = {
    val flat: Seq[Gen[GStep]] = Seq(
      labels1.map(GHasLabel),
      Gen.zip(ident, predicate).map { case (k, p) => GHas(k, p) },
      Gen.nonEmptyListOf(Gen.chooseNum(0L, 999L)).map(GHasId),
      Gen.zip(Gen.oneOf("out", "in", "both", "outE", "inE", "bothE"), labels)
        .map { case (k, ls) => GHop(k, ls) },
      Gen.oneOf("inV", "outV", "otherV").map(GToV),
      ident.map(GAs),
      ident.map(l => GSelect(Seq(l))),
      Gen.const(GDedup),
      Gen.chooseNum(1, 100).map(GLimit),
      Gen.zip(Gen.chooseNum(0, 50), Gen.chooseNum(0, 50))
        .map { case (a, b) => GRange(math.min(a, b), math.max(a, b)) },
      Gen.chooseNum(0, 100).map(GSkip),
      Gen.zip(ident, Gen.oneOf(true, false))
        .map { case (k, a) => GOrder(k, a) },
      Gen.zip(Gen.chooseNum(2, 64), Gen.chooseNum(0, 8))
        .map { case (d, b) => GSample(d, b) },
      ident.map(k => GHasKey(k, neg = false)),
      ident.map(k => GHasKey(k, neg = true)),
      ident.map(GAggregate),
      ident.map(GStore),
      Gen.const(GBarrier),
      Gen.const(GIdentity),
      predicate.map(GIs),
      Gen.chooseNum(0, 100).map(n => GCoin(n / 100.0)),
      Gen.zip(Gen.oneOf("sum", "mult", "min", "max"), ident)
        .map { case (op, k) => GSack(op, k) },
      Gen.const(GSimplePath))
    val nested: Seq[Gen[GStep]] =
      if (depth <= 0) Nil
      else Seq(
        Gen.zip(subChain(depth - 1), Gen.chooseNum(1, 5),
            Gen.oneOf(true, false))
          .map { case (s, n, e) => GRepeat(s, n, e) },
        Gen.zip(subChain(depth - 1), Gen.oneOf(true, false))
          .map { case (s, neg) => GWhere(s, neg) },
        Gen.chooseNum(1, 3)
          .flatMap(n => Gen.listOfN(n, subChain(depth - 1))).map(GUnion(_)),
        Gen.chooseNum(1, 3)
          .flatMap(n => Gen.listOfN(n, subChain(depth - 1))).map(GCoalesce(_)),
        Gen.zip(subChain(depth - 1), subChain(depth - 1),
            Gen.option(subChain(depth - 1)))
          .map { case (c, t, f) => GChoose(c, t, f.getOrElse(Nil)) },
        Gen.zip(subChain(depth - 1),
            Gen.option(Gen.zip(ident, Gen.oneOf(true, false))),
            Gen.chooseNum(1, 20))
          .map {
            // unordered form whose sub ends with order() parses back
            // as the ordered form — generate the normalized AST the
            // parser produces (same fold the parser applies)
            case (s, None, n) => s.lastOption match {
              case Some(GOrder(k2, a2)) => GLocal(s.init, k2, a2, n)
              case _ => GLocal(s, "", asc = true, n)
            }
            case (s, Some((k, a)), n) => GLocal(s, k, a, n)
          },
        subChain(depth - 1).map(GOptional),
        subChain(depth - 1).map(GRepeatUntil),
        {
          // target-reached until(): the stop is a filter chain or a
          // hop predicate (halt when the sub yields anything), with or
          // without emit()
          val stopFilter: Gen[GStep] = Gen.oneOf(
            Gen.zip(ident, predicate).map { case (k, p) => GHas(k, p) },
            Gen.nonEmptyListOf(Gen.chooseNum(0L, 999L)).map(GHasId),
            labels1.map(GHasLabel),
            ident.map(k => GHasKey(k, neg = true)),
            Gen.zip(Gen.oneOf("out", "in", "both"), labels)
              .map { case (k, ls) => GHop(k, ls) })
          Gen.zip(subChain(depth - 1),
              Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, stopFilter)),
              Gen.oneOf(true, false))
            .map { case (s, stop, e) => GRepeatUntilStop(s, stop, e) }
        })
    Gen.oneOf((flat ++ nested).head, (flat ++ nested)(1),
      (flat ++ nested).drop(2): _*)
  }

  private def subChain(depth: Int): Gen[Seq[GStep]] =
    Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, chainStep(depth)))

  private val terminal: Gen[GStep] = Gen.oneOf(
    Gen.const(GCount), ident.map(GValues),
    Gen.zip(Gen.oneOf("sum", "mean", "min", "max"), ident)
      .map { case (op, k) => GAgg(op, k) },
    Gen.zip(ident, ident, Gen.oneOf("sum", "mean", "min", "max"))
      .map { case (k, v, op) => GGroup(k, v, op) },
    Gen.nonEmptyListOf(ident).map(GValueMap(_)),
    ident.map(GGroupCount), Gen.const(GPath), Gen.const(GTree),
    labels.map(GElementMap(_)),
    Gen.const(GId), Gen.const(GLabel), Gen.const(GFold),
    ident.map(GPathBy),
    ident.map(GCap),
    Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n,
      Gen.zip(ident, subChain(1), ident))).map(GMatch(_)),
    Gen.chooseNum(2, 4).flatMap(n => Gen.listOfN(n, ident)).map(GSelect(_)),
    {
      val by: Gen[GBy] = Gen.oneOf(
        ident.map(GByKey), subChain(1).map(GBySubCount))
      Gen.chooseNum(1, 3)
        .flatMap(n => Gen.listOfN(n, Gen.zip(ident, by)))
        .map(ps => GProject(ps.map(_._1), ps.map(_._2)))
    },
    {
      // select() with by-modulators: ONE by for all labels or one per
      // label (the two TinkerPop arities the engine accepts)
      val by: Gen[GBy] = Gen.oneOf(
        ident.map(GByKey), subChain(1).map(GBySubCount))
      Gen.chooseNum(2, 4).flatMap(n => Gen.listOfN(n, ident).flatMap(ls =>
        Gen.oneOf(
          by.map(b => GSelect(ls, Seq(b))),
          Gen.listOfN(n, by).map(bs => GSelect(ls, bs)))))
    },
    // the TinkerPop withComputer OLAP steps
    Gen.zip(labels, Gen.chooseNum(1, 20), Gen.option(ident))
      .map { case (ls, n, p) => GPageRank(ls, n, p.getOrElse("")) },
    Gen.zip(labels, Gen.option(ident))
      .map { case (ls, p) => GConnectedComponent(ls, p.getOrElse("")) },
    {
      val targetFilter: Gen[GStep] = Gen.oneOf(
        Gen.zip(ident, predicate).map { case (k, p) => GHas(k, p) },
        Gen.nonEmptyListOf(Gen.chooseNum(0L, 999L)).map(GHasId),
        labels1.map(GHasLabel),
        ident.map(k => GHasKey(k, neg = true)))
      Gen.zip(
        Gen.zip(labels, Gen.oneOf(true, false)),
        Gen.chooseNum(0, 2).flatMap(n => Gen.listOfN(n, targetFilter)),
        Gen.option(ident),
        Gen.oneOf(Gen.const(-1L), Gen.chooseNum(0L, 50L)))
        .map { case ((ls, rev), tgt, w, md) =>
          GShortestPath(ls, rev, w.getOrElse(""), tgt, md) }
    })

  private val source: Gen[GStep] = Gen.oneOf(
    Gen.const(GSource(edge = false, Nil)),
    Gen.nonEmptyListOf(Gen.chooseNum(0L, 9999L))
      .map(ids => GSource(edge = false, ids)),
    Gen.const(GSource(edge = true, Nil)))

  private val query: Gen[Seq[GStep]] = for {
    sackPrefix <- Gen.option(
      Gen.chooseNum(0, 100).map(n => GWithSack(n / 10.0)))
    s <- source
    chain <- subChain(2)
    hasTerm <- Gen.oneOf(true, false)
    term <- terminal
  } yield sackPrefix.toSeq ++ (s +: chain) ++
    (if (hasTerm) Seq(term) else Nil)

  test("parse ∘ render = identity over 500 random ASTs") {
    (1 to 500).foreach { seed =>
      val ast = query.pureApply(Gen.Parameters.default, rng.Seed(seed.toLong))
      val text = GP.render(ast)
      val back =
        try GP.parse(text)
        catch {
          case e: Throwable =>
            fail(s"seed $seed: parse failed on rendered query\n  $text\n  $e")
        }
      assert(back == ast, s"seed $seed: round-trip mismatch\n  $text")
    }
  }

  test("rendered queries with terminals compile against a real graph") {
    val spark = TestSpark.spark
    import spark.implicits._
    val v = Seq((1L, "node", 10), (2L, "node", 20)).toDF("id", "label", "score")
    val e = Seq((1L, 2L, "next", 1L)).toDF("src", "dst", "label", "sort_key")
    val g = graft.graph.PropertyGraph(v, e)
    // compile (plan-build) every renderable query whose steps apply to
    // a vertex chain; execution correctness is the equivalence suite's
    // job — this pins "parser output is always compilable"
    var compiled = 0
    (1 to 200).foreach { seed =>
      val ast = query.pureApply(Gen.Parameters.default, rng.Seed(seed.toLong))
      try {
        GP.run(g, GP.render(ast)).queryExecution.analyzed
        compiled += 1
      } catch {
        case _: IllegalArgumentException => () // vertex/edge step mismatch etc.
        case _: ParseException => fail(s"seed $seed: rendered query failed to parse")
        case _: org.apache.spark.sql.AnalysisException => () // unknown prop column
      }
    }
    assert(compiled > 20, s"only $compiled/200 random queries compiled")
  }
}
