package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PiiContaminationSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("text")

  test("pii counts: emails, ipv4, phones found; plain text clean") {
    val r = one("mail a.b+c@sub.example.co.uk, backup root@h2.io, " +
      "call +4915123456789, server 192.168.0.1 and 10.0.255.7")
      .select(TextAnalysis.emailCount($"text"),
        TextAnalysis.ipv4Count($"text"),
        TextAnalysis.phoneCount($"text")).head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((2, 2, 1)))
    val clean = one("the quick brown fox jumps over the lazy dog at noon")
      .select(TextAnalysis.emailCount($"text"),
        TextAnalysis.ipv4Count($"text"),
        TextAnalysis.phoneCount($"text")).head()
    assert((clean.getInt(0), clean.getInt(1), clean.getInt(2)) == ((0, 0, 0)))
  }

  test("pii boundaries: short phones, version-like dotted pairs skipped") {
    val r = one("+123 v1.2 ip 1.2.3 semver 1.2.3.4 deep 1.2.3.4.5")
      .select(TextAnalysis.phoneCount($"text"),
        TextAnalysis.ipv4Count($"text")).head()
    // +123 too short; 1.2 / 1.2.3 not quads; 1.2.3.4 matches;
    // 1.2.3.4.5 is NOT word-bounded as a quad on either side... \b sits
    // between digit and dot? '.' is a non-word char, so \b holds after
    // '4' only if next char is non-word: '.' qualifies — the leading
    // quad of 1.2.3.4.5 matches in BOTH engines (documented looseness
    // of a word-boundary quad pattern; parity is what the oracle checks)
    assert(r.getInt(0) == 0)
    assert(r.getInt(1) == 2)
  }

  test("redactPii replaces all matches in contract order") {
    val got = one("u@h.com then 10.0.0.1 then +123456789 then v@w.org")
      .select(TextAnalysis.redactPii($"text")).head().getString(0)
    assert(got == "<EMAIL> then <IP> then <PHONE> then <EMAIL>")
  }

  test("url extraction: count and host list; plain text clean") {
    val r = one("see https://a.example.org/p/1 and http://b.net plain " +
      "ftp://skip.me text")
      .select(TextAnalysis.urlCount($"text"),
        TextAnalysis.domains($"text")).head()
    assert(r.getInt(0) == 2)
    assert(r.getSeq[String](1) == Seq("a.example.org", "b.net"))
    val clean = one("no links here at all")
      .select(TextAnalysis.urlCount($"text"),
        TextAnalysis.domains($"text")).head()
    assert(clean.getInt(0) == 0 && clean.getSeq[String](1).isEmpty)
  }

  test("contamination: planted overlap found, clean docs absent") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six"),
      (3L, "alpha beta gamma totally different tail here"),
      (4L, "nothing in common with anything else at all")
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1("alpha beta gamma delta epsilon zeta"))
      .toDF("text")
    val r = Curation.contamination(docs, bench, "doc_id", "text", "text")
      .collect().map(x => x.getLong(0) -> (x.getInt(1), x.getInt(2))).toMap
    // doc 1 IS the benchmark text: all 4 of its 3-gram shingles overlap
    assert(r(1L) == ((4, 4)))
    // doc 3 shares exactly 'alpha beta gamma'
    assert(r(3L) == ((5, 1)))
    // docs 2 and 4 share nothing — not in the report
    assert(!r.contains(2L) && !r.contains(4L))
  }

  test("contamination plan broadcasts the benchmark side") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val bench = Seq(Tuple1("a b c")).toDF("text")
    val plan = Curation.contamination(docs, bench, "doc_id", "text", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark side must broadcast; got:\n$plan")
  }

  test("stripMarkup: blocks whole, tags out, entities decoded, " +
      "whitespace collapsed") {
    def strip(s: String): String =
      one(s).select(TextAnalysis.stripMarkup($"text").as("c"))
        .head().getString(0)
    assert(strip("<html><head><STYLE>p {color:red}</STYLE>" +
      "<script type=\"t\">var i = \"<p>not prose</p>\";</script></head>" +
      "<body><h1>Title</h1><!-- note -->\n<p class=\"b\">hello\t " +
      "world</p></body></html>") == "Title hello world")
    // entities: amp decodes LAST, so &amp;lt; is the literal &lt;
    assert(strip("a&nbsp;b &lt;tag&gt; &quot;q&quot; &#39;s&#39; " +
      "x&amp;y &amp;lt;") == "a b <tag> \"q\" 's' x&y &lt;")
    // decoded angle brackets are prose, not tags
    assert(strip("keep &lt;script&gt;me&lt;/script&gt;") ==
      "keep <script>me</script>")
    // unclosed/script-free input passes through collapsed
    assert(strip("  plain   text  ") == "plain text")
  }
}
