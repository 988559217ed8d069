package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal property runner (the scalatest/scalacheck bridge artifact is
  * not in the offline cache). Deterministic seed for reproducibility. */
object GenForAll {
  def forAll[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) =>
          try f(a)
          catch {
            case e: Throwable =>
              throw new AssertionError(s"property failed for input: $a", e)
          }
        case None =>
      }
      seed = seed.next
      i += 1
    }
  }
}
