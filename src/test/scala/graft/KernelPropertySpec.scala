package graft

import org.scalacheck.Gen

import graft.functions.{SketchKernels, VectorKernels}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Generated-input properties for the hand-written kernels — the parts
  * of the engine where a loop bug would silently skew results rather
  * than crash.
  */
class KernelPropertySpec extends SparkSpec {

  private def arr(tokens: Seq[String]): GenericArrayData =
    new GenericArrayData(tokens.map(t =>
      if (t == null) null else UTF8String.fromString(t)).toArray[Any])

  private val tokenGen: Gen[List[String]] =
    Gen.listOfN(30, Gen.oneOf(
      Gen.alphaLowerStr.map(_.take(6)), Gen.const(null: String)))

  test("merge-walk jaccard equals hash-set jaccard on generated arrays") {
    val g = for { a <- tokenGen; b <- tokenGen } yield (a, b)
    (1 to 200).foreach { seed =>
      val (a, b) = g.apply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed.toLong)).get
      // the sorted kernel's contract: sorted + distinct, no nulls
      val sa = a.filter(_ != null).distinct.sorted
      val sb = b.filter(_ != null).distinct.sorted
      val viaHash = VectorKernels.jaccard(arr(sa), arr(sb))
      val viaMerge = VectorKernels.jaccardSorted(arr(sa), arr(sb))
      assert(viaHash === viaMerge, s"seed=$seed a=$sa b=$sb")
    }
  }

  test("sigAgreement matches elementwise comparison on generated signatures") {
    (1 to 200).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 1 + rnd.nextInt(64)
      val a = Array.fill(n)(rnd.nextLong() % 4) // force collisions
      val b = Array.fill(n)(rnd.nextLong() % 4)
      val expected = a.zip(b).count { case (x, y) => x == y }.toDouble / n
      val got = VectorKernels.sigAgreement(
        new GenericArrayData(a), new GenericArrayData(b))
      assert(got === expected, s"seed=$seed")
    }
  }

  test("minhash signature is permutation-invariant and monotone under union") {
    (1 to 100).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val tokens = List.fill(20)(rnd.alphanumeric.take(5).mkString)
      val shuffled = rnd.shuffle(tokens)
      val s1 = SketchKernels.minhash(arr(tokens), 32)
      val s2 = SketchKernels.minhash(arr(shuffled), 32)
      assert(s1.toLongArray.sameElements(s2.toLongArray),
        s"seed=$seed: order changed the sketch")
      // union property: sketch(a ++ b) = elementwise min
      val extra = List.fill(10)(rnd.alphanumeric.take(5).mkString)
      val su = SketchKernels.minhash(arr(tokens ++ extra), 32)
      val sx = SketchKernels.minhash(arr(extra), 32)
      val expected = s1.toLongArray.zip(sx.toLongArray)
        .map { case (x, y) => math.min(x, y) }
      assert(su.toLongArray.sameElements(expected), s"seed=$seed")
    }
  }

  test("srp signature flips no bits under positive scaling") {
    // sign(dot(c*v, h)) == sign(dot(v, h)) for c > 0 — scaling a vector
    // must not move it across any hyperplane
    (1 to 100).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val v = Array.fill(16)(rnd.nextGaussian())
      val c = 0.5 + rnd.nextDouble() * 10
      val scaled = v.map(_ * c)
      val s1 = VectorKernels.srpSignature(new GenericArrayData(v), false, 42L)
      val s2 = VectorKernels.srpSignature(new GenericArrayData(scaled), false, 42L)
      assert(s1 === s2, s"seed=$seed")
    }
  }
}
