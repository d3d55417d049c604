package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cleaning

/** Pins [[GraftPii]]'s hand-rolled scanners to the `java.util.regex`
  * composition they replace (the SAME engine Spark's `regexp_count` /
  * `regexp_replace` run): counts per pattern on the original text, then
  * the email → IPv4 → phone redaction chain. Adversarial fixed cases plus
  * a property sweep over a PII-dense alphabet.
  */
class PiiScrubSpec extends AnyFunSuite {
  private val emailP = Pattern.compile(Cleaning.EmailPattern)
  private val ipP = Pattern.compile(Cleaning.Ipv4Pattern)
  private val phoneP = Pattern.compile(Cleaning.PhonePattern)

  private def count(p: Pattern, s: String): Long = {
    val m = p.matcher(s); var n = 0L; while (m.find()) n += 1; n
  }
  private def expected(s: String): (Long, Long, Long, String) = {
    val clean = phoneP.matcher(
      ipP.matcher(
        emailP.matcher(s).replaceAll(GraftPii.EmailPlaceholder))
        .replaceAll(GraftPii.IpPlaceholder))
      .replaceAll(GraftPii.PhonePlaceholder)
    (count(emailP, s), count(ipP, s), count(phoneP, s), clean)
  }
  private def actual(s: String): (Long, Long, Long, String) = {
    val r = GraftPii.scrub(UTF8String.fromString(s))
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getUTF8String(3).toString)
  }
  private def check(s: String): Unit =
    assert(actual(s) == expected(s), s"input: <$s>")

  test("adversarial fixed cases match the regex composition exactly") {
    Seq(
      "", "plain text with no pii at all",
      // emails: greedy local/domain, backtracked TLD, dots in local
      "user@example.com", "a.b%c+d-e_f@sub.domain-x.org tail",
      "1.2.3.4user@x.com",          // digits absorbed into the local part
      "x@y.com1.2.3.4",             // domain run absorbs digits, TLD backtracks
      "a@b@c.com", "a@b.co@d.com",  // multiple '@', overlap ordering
      "..@x.com", " .x@y.com",      // dot-led local runs
      "a@.com", "a@b", "a@b.c",     // non-matching domains (TLD too short)
      "x@y..com", "x@y.c-m.org",    // empty label, dash in domain
      "pre user@a.b.c.d.museum post",
      // IPv4: word boundaries, quad widths, runs too long
      "1.2.3.4", "a1.2.3.4", "1.2.3.4a", "_1.2.3.4_",
      "1234.5.6.7", "1.2.3.4000", "999.999.999.999",
      "1.2.3.4.5", "1.2.3.400", "ip:10.0.0.1, other 8.8.8.8!",
      // the uncovered-IP chain case: replacing the email EXPOSES a \b the
      // original text hid — clean_text redacts it, n_ips must NOT count it
      "x@y.com1.2.3.4 end",
      // phones: exact widths, over-long digit tails, '+' reuse
      "+12-34-1234567", "+12-34-12345678", "+12-34-123456",
      "++12-34-1234567", "call +00-11-2223334 now",
      "+1a-34-1234567", "+12-3a-1234567",
      // mixtures
      "mail a@b.com ip 1.2.3.4 tel +12-34-1234567 mail2 c@d.org",
      "overlap a@1.2.3.4.com and bare 5.6.7.8",
      // non-ASCII neighbors (ADVICE r16): multibyte chars adjacent to
      // digit runs and pattern anchors — Java's default \b is ASCII-\w,
      // so 'é' and CJK are NON-word chars and a boundary exists; the
      // kernel's char-indexed scan must agree on UTF-16 units, including
      // across a 4-byte emoji's surrogate pair
      "é1.2.3.4", "1.2.3.4é", "éx@y.comé",
      "日本x@y.co 世1.2.3.4界", "電話+12-34-1234567です",
      "🎉1.2.3.4🎉", "🎉a@b.co", "naïve@exämple.com",
      "日1.2.3.4.5本", "é+12-34-12345678é",
    ).foreach(check)
  }

  test("property: kernel == regex composition over a PII-dense alphabet") {
    val piiChar = Gen.frequency(
      (6, Gen.alphaNumChar), (2, Gen.const('.')), (1, Gen.const('@')),
      (1, Gen.const('-')), (1, Gen.const('+')), (1, Gen.const('_')),
      (1, Gen.const('%')), (2, Gen.const(' ')), (1, Gen.numChar),
      // non-ASCII (ADVICE r16): 2- and 3-byte chars in the stream so
      // multibyte neighbors hit every anchor position; 4-byte emoji
      // (surrogate pairs) are seeded via the mid strings below
      (1, Gen.oneOf('é', '日', '世')))
    val piiString = for {
      n <- Gen.choose(0, 60)
      cs <- Gen.listOfN(n, piiChar)
    } yield cs.mkString
    val seeded = Gen.oneOf(piiString, for {
      pre <- piiString; mid <- Gen.oneOf("a@b.co", "1.2.3.4",
        "+12-34-1234567", "x@1.2.3.4.com", "@@", "9.9.9.999",
        "🎉1.2.3.4", "日x@y.co界")
      post <- piiString
    } yield pre + mid + post)
    (0 until 1000).foreach { i =>
      seeded.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }
  }

  test("property: kernel == regex composition on fully random code points") {
    // r17: the multibyte \b parity gap hid for two rounds because the
    // property alphabet was ASCII-only — this sweep draws UNRESTRICTED
    // code points (any plane, surrogates paired by Character.toChars)
    // around planted PII seeds so every anchor position meets arbitrary
    // Unicode neighbors, including astral ones
    val rnd = new scala.util.Random(1717)
    def randCp(): String = {
      val cp = rnd.nextInt(0x10FFFF + 1)
      if (cp >= 0xD800 && cp <= 0xDFFF) "x" // lone surrogates: not valid text
      else new String(Character.toChars(cp))
    }
    def randStr(n: Int): String = (0 until n).map(_ => randCp()).mkString
    val seeds = Seq("1.2.3.4", "a@b.co", "+12-34-1234567", "9.9.9.999", "")
    (0 until 400).foreach { i =>
      val s = randStr(rnd.nextInt(8)) + seeds(i % seeds.size) + randStr(rnd.nextInt(8))
      check(s)
    }
  }
}
