package graft.core.sketch

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM checks of the Misra-Gries kernel: the survival guarantee
  * (every item with frequency > n/(k+1) is a candidate) is what q97's
  * exactness rests on, so it is property-tested against adversarial
  * random streams, not just examples. Raw ScalaCheck Gens with a
  * fixed-seed sampler (the scalatest-scalacheck bridge isn't on the
  * offline classpath — TextPropertySpec's pattern). */
class MisraGriesSpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 200)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(0xC0FFEEL + i))
        .foreach(check)
    }

  private def exact(stream: Seq[String]): Map[String, Long] =
    stream.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("survival guarantee: frequency > n/(k+1) implies candidacy") {
    val streams = for {
      k <- Gen.choose(1, 8)
      n <- Gen.choose(0, 400)
      // small alphabet forces real heavy hitters AND constant churn
      s <- Gen.listOfN(n, Gen.choose(0, 12).map(i => s"w$i"))
    } yield (k, s)
    forAll(streams) { case (k, stream) =>
      val mg = new MisraGries(k)
      stream.foreach(mg.offer)
      assert(mg.n == stream.size)
      val cands = mg.candidates.toSet
      val threshold = stream.size.toDouble / (k + 1)
      exact(stream).foreach { case (item, f) =>
        if (f > threshold)
          assert(cands.contains(item),
            s"item $item freq $f > n/(k+1)=$threshold missing from $cands")
      }
      assert(cands.size <= k)
    }
  }

  test("candidate set is bounded by k even when vocabulary is not") {
    val mg = new MisraGries(3)
    (1 to 10000).foreach(i => mg.offer(s"unique$i"))
    assert(mg.candidates.size <= 3)
    assert(mg.n == 10000)
  }

  test("a single dominant item always survives arbitrary interleaving") {
    (1L to 40L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val stream = rnd.shuffle(
        List.fill(60)("HOT") ++ (1 to 100).map(i => s"cold$i").toList)
      val mg = new MisraGries(4)
      stream.foreach(mg.offer)
      assert(mg.candidates.contains("HOT")) // f=60 > 160/5=32
    }
  }

  test("k must be positive") {
    intercept[IllegalArgumentException](new MisraGries(0))
  }
}
