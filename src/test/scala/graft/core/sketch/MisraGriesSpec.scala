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

  test("merged summaries keep the survival guarantee (any split, any order)") {
    val cases = for {
      k <- Gen.choose(1, 8)
      n <- Gen.choose(0, 400)
      s <- Gen.listOfN(n, Gen.choose(0, 12).map(i => s"w$i"))
      nChunks <- Gen.choose(1, 5)
    } yield (k, s, nChunks)
    forAll(cases) { case (k, stream, nChunks) =>
      val chunkSize = math.max(1, (stream.size + nChunks - 1) / nChunks)
      val parts = stream.grouped(chunkSize).map { chunk =>
        val mg = new MisraGries(k)
        chunk.foreach(mg.offer)
        mg
      }.toSeq
      val merged = parts.headOption.getOrElse(new MisraGries(k))
      parts.drop(1).foreach(merged.absorb)
      assert(merged.n == stream.size)
      assert(merged.candidates.size <= k)
      val cands = merged.candidates.toSet
      val threshold = stream.size.toDouble / (k + 1)
      exact(stream).foreach { case (item, f) =>
        if (f > threshold)
          assert(cands.contains(item),
            s"item $item freq $f > $threshold lost in a $nChunks-way merge")
      }
    }
  }

  test("absorb refuses summaries of different k") {
    val a = new MisraGries(3)
    val b = new MisraGries(4)
    intercept[IllegalArgumentException](a.absorb(b))
  }

  test("snapshot → restore round-trips candidates and stream length") {
    val mg = new MisraGries(4)
    Seq("a", "b", "a", "c", "a", "d", "e", "a").foreach(mg.offer)
    val back = MisraGries.restore(mg.k, mg.n, mg.snapshot)
    assert(back.n == mg.n)
    assert(back.candidates.sorted == mg.candidates.sorted)
    // the restored summary keeps absorbing correctly
    val other = new MisraGries(4)
    Seq("a", "a").foreach(other.offer)
    back.absorb(other)
    assert(back.n == mg.n + 2)
    assert(back.candidates.contains("a"))
  }
}
