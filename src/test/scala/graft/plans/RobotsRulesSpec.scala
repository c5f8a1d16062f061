package graft.plans

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** [[RobotsKernel]] — RFC 9309 / Google robots.txt semantics. */
class RobotsRulesSpec extends AnyFunSuite {

  private def eval(robots: String, agent: String, path: String)
      : (Boolean, String, Int) = {
    val r = RobotsKernel.evaluate(UTF8String.fromString(robots),
      UTF8String.fromString(s"$agent $path"))
    (r.getBoolean(0), r.getUTF8String(1).toString, r.getInt(2))
  }

  test("longest match wins; allow wins length ties; empty disallow " +
      "matches nothing; no rule -> allowed") {
    val robots =
      """User-agent: *
        |Disallow: /private/
        |Allow: /private/ok
        |Disallow: /tmp
        |Disallow:
        |""".stripMargin
    assert(eval(robots, "bot", "/private/x") ==
      (false, "disallow:/private/", 4))
    assert(eval(robots, "bot", "/private/ok/page") ==
      (true, "allow:/private/ok", 4))
    assert(eval(robots, "bot", "/tmpfile") ==
      (false, "disallow:/tmp", 4)) // prefix semantics
    assert(eval(robots, "bot", "/public") == (true, "", 4))
    // exact length tie: Allow wins
    val tie = "User-agent: *\nDisallow: /dir/\nAllow: /dir/\n"
    assert(eval(tie, "b", "/dir/x")._1 == true)
  }

  test("wildcards and end anchors: * spans runs, $ anchors the end") {
    val robots =
      """User-agent: *
        |Disallow: /*.pdf$
        |Disallow: /cgi*bin/
        |Allow: /cgi-bin/pub*
        |""".stripMargin
    assert(eval(robots, "b", "/docs/a.pdf")._1 == false)
    assert(eval(robots, "b", "/docs/a.pdfx")._1 == true) // anchored
    assert(eval(robots, "b", "/cgi-bin/priv")._1 == false)
    assert(eval(robots, "b", "/cgi-bin/pub/x")._1 == true) // longer
    assert(eval(robots, "b", "/cgixbin/z")._1 == false)
  }

  test("group selection: longest specific agent-token prefix beats " +
      "*; consecutive UA lines share one group; same-agent groups " +
      "merge; rules before any group are ignored") {
    val robots =
      """Disallow: /ignored-orphan
        |User-agent: googlebot-news
        |Disallow: /news-only
        |User-agent: googlebot
        |User-agent: bingbot
        |Disallow: /major
        |User-agent: *
        |Disallow: /everyone
        |User-agent: googlebot
        |Disallow: /more-google
        |""".stripMargin
    // googlebot-news: most specific group
    assert(eval(robots, "googlebot-news", "/news-only")._1 == false)
    assert(eval(robots, "googlebot-news", "/major")._1 == true)
    // googlebot: the two googlebot groups MERGE (2 rules)
    val g = eval(robots, "googlebot", "/more-google")
    assert(g._1 == false && g._3 == 2)
    assert(eval(robots, "googlebot", "/everyone")._1 == true)
    // bingbot shares the consecutive-UA group
    assert(eval(robots, "bingbot", "/major")._1 == false)
    // unknown agent falls to *
    assert(eval(robots, "ccbot", "/everyone")._1 == false)
    assert(eval(robots, "ccbot", "/ignored-orphan")._1 == true)
  }

  test("comments, CRLF, case-insensitive keys, unknown directives") {
    val robots =
      "USER-AGENT: * # the catch-all\r\n" +
        "Crawl-delay: 10\r\n" +
        "DISALLOW: /a # trailing comment\r\n" +
        "Sitemap: https://x/sitemap.xml\r\n"
    assert(eval(robots, "b", "/a/z") == (false, "disallow:/a", 1))
    assert(eval(robots, "b", "/b") == (true, "", 1))
  }

  test("an empty User-agent: value never outranks the '*' fallback " +
      "group (round-17 advice fix)") {
    val robots = "User-agent:\nDisallow: /\n\n" +
      "User-agent: *\nAllow: /\n"
    // the malformed empty-agent group would prefix-match every agent
    // at score 0 and shadow the catch-all; it must be ignored
    val (allowed, rule, _) = eval(robots, "graftbot", "/page")
    assert(allowed, s"empty-agent group must not shadow '*': $rule")
  }
}
