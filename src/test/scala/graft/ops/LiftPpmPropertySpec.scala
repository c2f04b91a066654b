package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the q_cooccur_lift integer sequence
  * ((n_ab·1e6) div df_a)·N div df_b (TextAnalysis.cooccurLift), checked
  * far past the corpus sizes any test dataset reaches (no Spark session —
  * this is the arithmetic both engines replay):
  *
  *  1. NO OVERFLOW: every intermediate fits in a signed 64-bit long up to
  *     N ≈ 9e12 documents (the documented safe bound) — the Long
  *     evaluation equals a BigInt evaluation of the same sequence.
  *  2. PRECISION BOUND: the early floor's remainder, amplified by the
  *     later ·N, can make the result undershoot the exact
  *     floor(n_ab·1e6·N/(df_a·df_b)) by at most ceil(N/df_b) — which the
  *     ≥10%-of-corpus spine filter (df·10 ≥ N) caps at 10 ppm.
  *
  * The domain constraints mirror the query: df_a,df_b ≥ N/10 (spine),
  * n_ab ≤ min(df_a, df_b) (a pair can't co-occur more often than either
  * token occurs). */
class LiftPpmPropertySpec extends AnyFunSuite {

  private val M = 1000000L

  /** The exact sequence both engines execute, in Long. */
  private def divideFirst(nAb: Long, dfa: Long, dfb: Long, n: Long): Long =
    ((nAb * M) / dfa) * n / dfb

  private def caseGen: Gen[(Long, Long, Long, Long)] = for {
    // corpus size up to the documented ~9e12-doc safe bound
    n <- Gen.chooseNum(10L, 9000000000000L)
    dfa <- Gen.chooseNum((n + 9) / 10, n) // spine: df·10 ≥ n
    dfb <- Gen.chooseNum((n + 9) / 10, n)
    nAb <- Gen.chooseNum(1L, math.min(dfa, dfb))
  } yield (nAb, dfa, dfb, n)

  private def sample(i: Int): (Long, Long, Long, Long) =
    caseGen.apply(Gen.Parameters.default, Seed(i.toLong)).get

  test("divide-first never overflows below the 9e12-doc bound (Long == BigInt replay)") {
    for (i <- 1 to 2000) {
      val (nAb, dfa, dfb, n) = sample(i)
      val big = ((BigInt(nAb) * M) / dfa) * n / dfb
      assert(big.isValidLong && big.toLong == divideFirst(nAb, dfa, dfb, n),
        s"overflow or divergence at n_ab=$nAb dfa=$dfa dfb=$dfb n=$n")
    }
  }

  test("undershoot vs the exact floor is within ceil(n/dfb) and never above 10 ppm") {
    var worst = 0L
    for (i <- 2001 to 4000) {
      val (nAb, dfa, dfb, n) = sample(i)
      val exact = (BigInt(nAb) * M * n) / (BigInt(dfa) * dfb)
      val got = BigInt(divideFirst(nAb, dfa, dfb, n))
      val under = exact - got
      val bound = (n + dfb - 1) / dfb // ceil(n/dfb), ≤ 10 on the spine
      assert(under >= 0, s"divide-first must never exceed the exact value ($i)")
      assert(under <= bound && bound <= 10,
        s"undershoot $under > bound $bound at n_ab=$nAb dfa=$dfa dfb=$dfb n=$n")
      if (under > worst) worst = under.toLong
    }
    // the bound is tight enough to matter: the generator actually
    // exercises non-zero undershoot, not just exact-division cases
    assert(worst > 0, "generator never hit a lossy case — property is vacuous")
  }

  test("naive single-expression order would overflow where divide-first does not") {
    // the regression this guards: n_ab·1e6·n as one term breaks past ~3M
    // docs, which is why the engines floor early. One concrete witness.
    val (nAb, dfa, dfb, n) = (4000000L, 4000000L, 4000000L, 10000000L)
    assert(BigInt(nAb) * M * n > BigInt(Long.MaxValue), "witness must overflow naively")
    val big = ((BigInt(nAb) * M) / dfa) * n / dfb
    assert(big.isValidLong && big.toLong == divideFirst(nAb, dfa, dfb, n))
  }
}
