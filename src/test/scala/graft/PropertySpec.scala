package graft

import graft.functions.Tokenizer
import graft.operators.Multimodal

/** Property-style tests over the deterministic kernels (SURVEY §5: the
  * reference ships no tests; idempotence/invariant laws are ours). Inputs
  * are generated from a fixed seed so failures reproduce.
  */
class PropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)
  private def randomStrings(n: Int): Seq[String] =
    (0 until n).map { _ =>
      val len = rnd.nextInt(40)
      (0 until len).map(_ => (rnd.nextInt(95) + 32).toChar).mkString
    } ++ Seq("", " ", "!!!", "Spark大数据Engine", "a b  c\t\nd")

  private def randomBytes(n: Int): Seq[Array[Byte]] =
    (0 until n).map { _ =>
      val b = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(b); b
    } :+ Array.emptyByteArray

  test("tokenizer is idempotent on its own output") {
    randomStrings(200).foreach { s =>
      val once = Tokenizer.splitWords(s)
      assert(once.flatMap(Tokenizer.splitWords) == once, s"input: ${s.take(40)}")
    }
  }

  test("tokenizer emits no empty tokens and only lowercase") {
    randomStrings(200).foreach { s =>
      val toks = Tokenizer.splitWords(s)
      assert(toks.forall(t => t.nonEmpty && t == t.toLowerCase), s"input: ${s.take(40)}")
    }
  }

  test("stub decode is shape-stable with features in byte-value range") {
    randomBytes(100).foreach { b =>
      val f = Multimodal.decodeFeatures(b)
      assert(f.length == 8 && f.forall(v => v >= 0.0 && v <= 255.0))
    }
  }

  test("resize never grows and step=1 is identity") {
    randomBytes(100).foreach { b =>
      (1 to 5).foreach { step =>
        assert(Multimodal.resize(b, step).length <= b.length)
      }
      assert(Multimodal.resize(b, 1).toSeq == b.toSeq)
    }
  }
}
