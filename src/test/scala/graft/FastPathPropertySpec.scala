package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

import graft.operators.PointReader

/** Property pins for round-12's serving-path primitives:
  *  - `RobotsMatch.compute` ≡ the compiled-regex form it replaced
  *    (`^escaped-with-.*` [+ `$`]), over random paths and rule paths —
  *    the two-pointer scan must be a pure performance change;
  *  - `BufferedSeekableStream` (via [[PointReader.BufferedLocalInputFile]])
  *    returns byte-identical data to ground truth under random seeks and
  *    mixed read shapes (single-byte, array, ByteBuffer, readFully) —
  *    the buffering must be invisible.
  */
class FastPathPropertySpec extends AnyFunSuite {

  private def check(p: Prop, min: Int = 60): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(r.passed, r.status.toString)
  }

  // ------------------------------------------------------- RobotsMatch

  /** The regex oracle: exactly parseRules' compilation (strip trailing
    * `$` → escape regex metachars except `*` → `*` → `.*` → anchor). */
  private def regexMatch(path: String, rule: String): Boolean = {
    val anchored = rule.endsWith("$")
    val core = if (anchored) rule.dropRight(1) else rule
    val escaped = core.replaceAll(
      "([\\.\\[\\]\\{\\}\\(\\)\\+\\?\\^\\$\\|\\\\])", "\\\\$1")
    val pattern = "^" + escaped.replace("*", ".*") +
      (if (anchored) "$" else "")
    java.util.regex.Pattern.compile(pattern).matcher(path).find()
  }

  private val genPathChar =
    Gen.frequency(8 -> Gen.alphaNumChar, 3 -> Gen.oneOf('/', '.', '-'),
      1 -> Gen.oneOf('$', '+', '(', '~'))
  private val genPath: Gen[String] =
    Gen.choose(0, 18).flatMap(n =>
      Gen.listOfN(n, genPathChar).map("/" + _.mkString))
  private val genRule: Gen[String] =
    Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        6 -> genPathChar, 2 -> Gen.const('*'), 1 -> Gen.const('$')))
        .map("/" + _.mkString))

  test("RobotsMatch ≡ the compiled-regex rule form") {
    check(Prop.forAll(genPath, genRule) { (path, rule) =>
      val native = org.apache.spark.sql.graft.RobotsMatch.compute(
        UTF8String.fromString(path), UTF8String.fromString(rule))
      native == regexMatch(path, rule)
    }, min = 400)
    // the documented anchor/wildcard corners, explicitly
    val cases = Seq(
      ("/ab", "/ab$", true), ("/abc", "/ab$", false),
      ("/abc", "/ab", true), ("/ab", "/a*b$", true),
      ("/axxb", "/a*b$", true), ("/axxbc", "/a*b$", false),
      ("/axxbc", "/a*b", true), ("/a$b", "/a$b", true),
      ("/x", "/*$", true), ("/data.bin", "/*.bin$", true),
      ("/data.binx", "/*.bin$", false), ("/p", "/p*", true),
      ("", "$", true), ("/q", "$", false))
    cases.foreach { case (p, r, want) =>
      assert(org.apache.spark.sql.graft.RobotsMatch.compute(
        UTF8String.fromString(p), UTF8String.fromString(r)) == want,
        s"path=$p rule=$r")
      assert(regexMatch(p, r) == want, s"oracle: path=$p rule=$r")
    }
  }

  // -------------------------------------------- BufferedSeekableStream

  test("buffered local input stream is byte-identical under random access") {
    val rnd = new scala.util.Random(12)
    val data = Array.fill[Byte](200000)(rnd.nextInt().toByte)
    val tmp = java.nio.file.Files.createTempFile("graft-bss", ".bin")
    java.nio.file.Files.write(tmp, data)
    // small window (1 KB) so reads routinely straddle and bypass it
    val in = new PointReader.BufferedLocalInputFile(tmp, bufSize = 1024)
    assert(in.getLength == data.length)

    val genOp: Gen[(Int, Int)] = for {
      pos <- Gen.choose(0, data.length - 1)
      len <- Gen.frequency(4 -> Gen.choose(0, 64),
        2 -> Gen.choose(65, 3000), 1 -> Gen.choose(3001, 50000))
    } yield (pos, math.min(len, data.length - pos))

    check(Prop.forAll(Gen.listOfN(12, genOp), Gen.choose(0, 3)) {
      (ops, mode) =>
        val s = in.newStream()
        try ops.forall { case (pos, len) =>
          s.seek(pos)
          val got = mode match {
            case 0 => // single-byte reads
              val b = new Array[Byte](len)
              var i = 0
              var ok = true
              while (ok && i < len) {
                val v = s.read()
                if (v < 0) ok = false else { b(i) = v.toByte; i += 1 }
              }
              if (!ok) null else b
            case 1 => // readFully(array)
              val b = new Array[Byte](len)
              s.readFully(b, 0, len)
              b
            case 2 => // ByteBuffer reads
              val bb = java.nio.ByteBuffer.allocate(len)
              while (bb.hasRemaining && s.read(bb) >= 0) ()
              bb.array()
            case _ => // readFully(ByteBuffer)
              val bb = java.nio.ByteBuffer.allocate(len)
              s.readFully(bb)
              bb.array()
          }
          got != null &&
            java.util.Arrays.equals(got,
              java.util.Arrays.copyOfRange(data, pos, pos + len)) &&
            s.getPos == pos + len
        } finally s.close()
    }, min = 120)
    java.nio.file.Files.delete(tmp): Unit
  }

  test("buffered stream EOF behavior matches contract") {
    val tmp = java.nio.file.Files.createTempFile("graft-bss2", ".bin")
    java.nio.file.Files.write(tmp, Array[Byte](1, 2, 3))
    val in = new PointReader.BufferedLocalInputFile(tmp, bufSize = 2)
    val s = in.newStream()
    try {
      s.seek(3)
      assert(s.read() == -1)
      s.seek(1)
      assert(s.read() == 2)
      intercept[java.io.EOFException] {
        s.readFully(new Array[Byte](5), 0, 5)
      }
    } finally s.close()
    java.nio.file.Files.delete(tmp): Unit
  }
}
