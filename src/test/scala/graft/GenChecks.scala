package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal property-check helper over plain scalacheck generators (the
  * scalatest-scalacheck bridge isn't on the offline classpath). Fixed seed
  * sequence → deterministic runs. */
trait GenChecks {
  def forAll[A](gen: Gen[A], trials: Int = 50)(body: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < trials) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => body(a); i += 1 }
      seed = seed.next
    }
  }

  def forAll[A, B](genA: Gen[A], genB: Gen[B])(body: (A, B) => Unit): Unit =
    forAll(Gen.zip(genA, genB))(t => body(t._1, t._2))
}
