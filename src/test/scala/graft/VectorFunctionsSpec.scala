package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{vectors => V}

/** Checks the vector Column functions against exact BigDecimal reference
  * math: the decimal-fold and unrolled-chain variants must agree with each
  * other and with the reference to the last bit. */
class VectorFunctionsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val dim = 16
  private def randVec(): Seq[Float] = Seq.fill(dim)((rnd.nextFloat() - 0.5f) * 2f)
  private val pairs = Seq.fill(25)((randVec(), randVec()))

  test("dot (fold) and dotExactUnrolled equal the BigDecimal reference") {
    val got = pairs.toDF("a", "b")
      .select(V.dot(col("a"), col("b")), V.dotExactUnrolled(col("a"), col("b"), dim))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    got.zip(pairs).foreach { case ((fold, unrolled), (a, b)) =>
      val expect = refDot(a, b)
      assert(fold == expect, s"dot fold vs reference")
      assert(unrolled == expect, s"dot unrolled vs reference")
    }
  }

  test("normSq variants agree; cosine matches reference, symmetric, bounded") {
    val got = pairs.toDF("a", "b")
      .select(
        V.normSq(col("a")), V.normSqExactUnrolled(col("a"), dim),
        V.cosine(col("a"), col("b")), V.cosine(col("b"), col("a")),
        V.cosineFromParts(
          V.dotExactUnrolled(col("a"), col("b"), dim),
          V.normSqExactUnrolled(col("a"), dim),
          V.normSqExactUnrolled(col("b"), dim)))
      .collect()
    got.zip(pairs).foreach { case (r, (a, b)) =>
      assert(r.getDouble(0) == refDot(a, a), "normSq fold")
      assert(r.getDouble(1) == refDot(a, a), "normSq unrolled")
      val cos = r.getDouble(2)
      assert(cos == refCosine(a, b), "cosine vs reference")
      assert(cos == r.getDouble(3), "cosine symmetry")
      assert(cos == r.getDouble(4), "cosineFromParts == cosine")
      assert(cos >= -1.0 - 2e-9 && cos <= 1.0 + 2e-9)
    }
  }

  test("cosine: self ~ 1, zero vector -> 0") {
    val z = Seq.fill(dim)(0.0f)
    val a = randVec()
    val got = Seq((a, a, z)).toDF("a", "b", "z")
      .select(V.cosine(col("a"), col("b")), V.cosine(col("a"), col("z")))
      .collect().head
    assert(math.abs(got.getDouble(0) - 1.0) <= 2e-9)
    assert(got.getDouble(1) == 0.0)
  }

  test("dotUnrolled prefilter is within float-accumulation error of exact") {
    val got = pairs.toDF("a", "b")
      .select(V.dotUnrolled(col("a"), col("b"), dim), V.dot(col("a"), col("b")))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    got.foreach { case (approx, exact) =>
      assert(math.abs(approx - exact) < 1e-10)
    }
  }

  test("native graft_dot / graft_dot_exact match the Column variants bit-for-bit") {
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val got = pairs.toDF("a", "b")
      .select(
        call_function("graft_dot", col("a"), col("b")),
        V.dotUnrolled(col("a"), col("b"), dim),
        call_function("graft_dot_exact", col("a"), col("b")))
      .collect()
    got.zip(pairs).foreach { case (r, (a, b)) =>
      assert(r.getDouble(0) == r.getDouble(1), "native approx == unrolled chain")
      assert(r.getDouble(2) == refDot(a, b), "native exact == BigDecimal reference")
    }
  }

  test("signBucket is the sign pattern of the leading dims") {
    val vs = Seq(Seq(0.5f, -1f, 0f, 2f), Seq(-0.1f, -0.2f, 3f, -4f))
    val got = vs.toDF("v").select(V.signBucket(col("v"), 4))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("1011", "0010"))
  }
}
