package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Actions, OrderedUpdateEvent}
import graft.operators.InventoryFold

/** ScalaCheck properties for the INC/DEC/REP fold: algebraic laws of the
  * pure model (cheap, 200 cases) and a differential property of the Spark
  * window formulation against the model (15 generated streams — each case
  * is a Spark job). Complements the seeded rounds in InventoryFoldSpec with
  * generator-driven shapes (empty groups, single REP, long tails...). */
class FoldPropertySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val genAction = Gen.oneOf(Actions.Inc, Actions.Dec, Actions.Rep)
  private val genEvent = for {
    a <- genAction
    d <- Gen.choose(1, 10)
  } yield (a, d)
  private val genSeq = Gen.listOf(genEvent)

  private def check(p: Prop, cases: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(res.passed, res.status.toString)
  }

  test("model law: a REP makes everything before it irrelevant") {
    check(Prop.forAll(genSeq, genSeq, Gen.choose(1, 10)) { (before, after, rep) =>
      Actions.foldAll(before ++ ((Actions.Rep, rep) +: after)) ==
        Actions.foldAll((Actions.Rep, rep) +: after)
    }, 200)
  }

  test("model law: without REP the fold is the signed sum (order-free)") {
    val noRep = Gen.listOf(for {
      a <- Gen.oneOf(Actions.Inc, Actions.Dec)
      d <- Gen.choose(1, 10)
    } yield (a, d))
    check(Prop.forAll(noRep) { evs =>
      val signed = evs.map { case (a, d) => if (a == Actions.Inc) d else -d }.sum
      Actions.foldAll(evs) == signed &&
        Actions.foldAll(evs.reverse) == signed
    }, 200)
  }

  test("model law: fold is prefix-composable (state carries across rounds)") {
    check(Prop.forAll(genSeq, genSeq) { (r1, r2) =>
      Actions.foldAll(r1 ++ r2) == Actions.foldAll(r2, init = Actions.foldAll(r1))
    }, 200)
  }

  test("differential: Spark window fold equals the model on generated streams") {
    import spark.implicits._
    val genStream = for {
      nKeys <- Gen.choose(1, 6)
      perKey <- Gen.listOfN(nKeys, Gen.choose(0, 15))
      events <- Gen.sequence[Seq[Seq[(String, Int)]], Seq[(String, Int)]](
        perKey.map(n => Gen.listOfN(n, genEvent)))
    } yield events.zipWithIndex.flatMap { case (evs, k) =>
      evs.zipWithIndex.map { case ((a, d), i) =>
        OrderedUpdateEvent(s"key$k", i.toLong * nKeys + k + 1, a, d)
      }
    }
    check(Prop.forAll(genStream) { events =>
      val model = events.groupBy(_.productCode).map { case (k, es) =>
        k -> Actions.foldAll(es.sortBy(_.eventOrder).map(e => (e.action, e.delta))).toLong
      }
      val df = scala.util.Random.shuffle(events).toDS().toDF()
        .selectExpr("productCode as product_code", "eventOrder as event_order", "action", "delta")
      val got = InventoryFold.fold(df).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      got == model
    }, 15)
  }
}
