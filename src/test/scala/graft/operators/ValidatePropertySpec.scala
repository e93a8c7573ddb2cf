package graft.operators

import graft.SparkSpec
import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed

/** Property test (SURVEY.md §5): for any frame, Validate.clean leaves
  * every string trimmed, every numeric non-negative, other types
  * untouched. Raw ScalaCheck generators with fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline dependency set). */
class ValidatePropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowGen: Gen[(String, Int, Double, Boolean)] = for {
    s <- Gen.oneOf(Gen.alphaNumStr, Gen.const("  padded  "),
      Gen.const("\t tab \n"), Gen.const(""))
    i <- Arbitrary.arbitrary[Int].suchThat(_ != Int.MinValue)
    d <- Gen.chooseNum(-1e6, 1e6)
    b <- Arbitrary.arbitrary[Boolean]
  } yield (s, i, d, b)

  test("clean: strings trimmed, numerics non-negative, booleans untouched") {
    for (seed <- 1L to 8L) {
      val rows = Gen.listOfN(25, rowGen)
        .apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(fail(s"generator exhausted at seed $seed"))
      val df = rows.toDF("s", "i", "d", "b")
      val out = Validate.clean(df).collect()
      out.foreach { r =>
        val s = r.getString(0)
        // SQL trim semantics (what the reference's functions.trim does):
        // only SPACE (0x20) is stripped — tabs/newlines are content
        assert(!s.startsWith(" ") && !s.endsWith(" "),
          s"string not space-trimmed: '$s' (seed $seed)")
        assert(r.getInt(1) >= 0, s"seed $seed")
        assert(r.getDouble(2) >= 0.0, s"seed $seed")
      }
      assert(out.length == rows.length)
      assert(out.map(_.getBoolean(3)).count(identity) ==
        rows.map(_._4).count(identity))
    }
  }
}
