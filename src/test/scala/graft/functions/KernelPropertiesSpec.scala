package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Algebraic properties of the codegen kernels, checked directly on the
  * kernel objects (no Spark session — these are the invariants the
  * distributed algorithms lean on). Generators sampled with fixed seeds,
  * as in ChecksumSpec. */
class KernelPropertiesSpec extends AnyFunSuite {

  private val tokenGen = Gen.nonEmptyListOf(
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString))
  private def sample(i: Int): List[String] =
    tokenGen.apply(Gen.Parameters.default, Seed(i.toLong)).get

  private def arr(tokens: Seq[String]) =
    new GenericArrayData(tokens.map(t => UTF8String.fromString(t)).toArray[Any])

  private def minhash(tokens: Seq[String], k: Int = 8): Seq[Long] = {
    val a = MinhashKernel.sig(arr(tokens), k)
    (0 until k).map(a.getLong)
  }

  test("DoubleVecDot: interpreted eval equals a strict left-to-right fold, incl. NaN/Inf/denormals") {
    val valGen = Gen.oneOf(
      Gen.chooseNum(-127.0, 127.0).map(math.round(_).toDouble), // integer codes
      Gen.chooseNum(-1e6, 1e6),
      Gen.oneOf(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
        Double.MinPositiveValue, 1e-310))
    val vecGen = Gen.listOfN(64, valGen)
    def sampleVec(i: Int): List[Double] =
      vecGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
    def darr(xs: Seq[Double]) = new GenericArrayData(xs.toArray[Any])
    for (i <- 1 to 50) {
      val a = sampleVec(i); val b = sampleVec(5000 + i)
      val native = DoubleVecDot(null, null)
        .nullSafeEval(darr(a), darr(b)).asInstanceOf[Double]
      var acc = 0.0
      a.zip(b).foreach { case (x, y) => acc += x * y }
      assert(java.lang.Double.doubleToLongBits(native) ==
        java.lang.Double.doubleToLongBits(acc), s"seed $i")
    }
  }

  test("minhash: signature of a union is the elementwise min (LSH mergeability)") {
    for (i <- 1 to 50) {
      val xs = sample(i); val ys = sample(1000 + i)
      val merged = minhash(xs ++ ys)
      val expected = minhash(xs).zip(minhash(ys)).map { case (p, q) => math.min(p, q) }
      assert(merged == expected, s"seed $i")
    }
  }

  test("minhash: duplicate tokens never change the signature (set semantics)") {
    for (i <- 1 to 50) {
      val xs = sample(i)
      assert(minhash(xs ++ xs ++ xs.take(1)) == minhash(xs), s"seed $i")
    }
  }

  test("simhash: permutation-invariant, multiplicity-sensitive") {
    for (i <- 1 to 50) {
      val xs = sample(i)
      val shuffled = new scala.util.Random(i).shuffle(xs)
      assert(SimhashKernel.sig(arr(xs)) == SimhashKernel.sig(arr(shuffled)), s"seed $i")
    }
  }

  test("fingerprint: appending a token extends the digest linearly") {
    for (i <- 1 to 50) {
      val xs = sample(i)
      val t = sample(2000 + i).head
      val base = FingerprintKernel.sig(arr(xs))
      val ext = FingerprintKernel.sig(arr(xs :+ t))
      val term = FingerprintKernel.sig(arr(Seq(t))) // 1 * h40(t) mod p
      // position weight of the appended token is (len+1); term has weight 1
      val h40 = term // weight-1 digest IS h40 mod p
      assert(ext == base + ((xs.length + 1) * h40) % 1000000007L, s"seed $i")
    }
  }

  test("fingerprint: order-sensitive for non-palindromic reorderings") {
    val a = FingerprintKernel.sig(arr(Seq("x", "y")))
    val b = FingerprintKernel.sig(arr(Seq("y", "x")))
    assert(a != b)
  }

  test("ngrams: count and reconstruction invariants") {
    for (i <- 1 to 50) {
      val s = sample(i).mkString(" ")
      val u = UTF8String.fromString(s)
      val g3 = NgramKernel.compute(u, 3)
      assert(g3.numElements() == math.max(0, u.numChars() - 2), s"seed $i")
      val g1 = NgramKernel.compute(u, 1)
      val rebuilt = (0 until g1.numElements()).map(g1.getUTF8String(_).toString).mkString
      assert(rebuilt == s, s"seed $i")
    }
  }

  test("token stats: counters are additive under concatenation except distinct") {
    for (i <- 1 to 50) {
      val xs = sample(i); val ys = sample(3000 + i)
      val stop = new java.util.HashSet[UTF8String]()
      stop.add(UTF8String.fromString(xs.head))
      val sx = TokenStatsKernel.stats(arr(xs), stop)
      val sy = TokenStatsKernel.stats(arr(ys), stop)
      val sxy = TokenStatsKernel.stats(arr(xs ++ ys), stop)
      assert(sxy.getLong(0) == sx.getLong(0) + sy.getLong(0))    // n_tok adds
      assert(sxy.getLong(2) == sx.getLong(2) + sy.getLong(2))    // len_sum adds
      assert(sxy.getLong(3) == sx.getLong(3) + sy.getLong(3))    // n_stop adds
      assert(sxy.getLong(1) <= sx.getLong(1) + sy.getLong(1))    // distinct subadditive
      assert(sxy.getLong(1) >= math.max(sx.getLong(1), sy.getLong(1)))
    }
  }

  test("fingerprint term bound: every weight-1 digest stays under the modulus") {
    for (i <- 1 to 100) {
      val t = sample(i).head
      assert(FingerprintKernel.sig(arr(Seq(t))) < 1000000007L)
    }
  }
}
