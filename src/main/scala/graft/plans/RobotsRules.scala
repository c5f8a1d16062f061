package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt EVALUATION (round 16) — the crawl-frontier gate every
  * fetch pipeline runs before a URL is eligible (Common Crawl ships
  * the robots responses alongside the page captures). Implements the
  * PUBLISHED longest-match semantics (RFC 9309 / Google's robots.txt
  * specification):
  *
  *  - line grammar: `key: value` with `#` comments stripped, keys
  *    case-insensitive; consecutive `User-agent` lines open ONE group
  *    sharing the following `Allow`/`Disallow` rules; rules before
  *    any group are ignored;
  *  - group selection: the group whose user-agent token is the
  *    longest case-insensitive PREFIX of the product token wins;
  *    `*` matches any agent but only applies when no specific group
  *    matched;
  *  - rule matching: patterns match path prefixes with `*` as any-run
  *    wildcard and `$` as an end anchor; the LONGEST (by pattern
  *    octet length) matching rule wins; on a length tie `Allow` wins
  *    (the published tie-break); an empty `Disallow:` matches nothing;
  *    no matching rule → allowed.
  *
  * Row-local: one parse + one match per (robots, path) pair — the
  * check rides the scan. Returns struct(allowed, matched_rule ('' if
  * none), n_rules in the selected group). PERMISSIVE: null inputs →
  * null; a malformed line is skipped, never fatal. */
object RobotsKernel {

  val schema: StructType = StructType(Seq(
    StructField("allowed", BooleanType, nullable = false),
    StructField("matched_rule", StringType, nullable = false),
    StructField("n_rules", IntegerType, nullable = false)))

  /** One pattern match per RFC 9309: '*' = any run, '$' at pattern
    * end = anchor; otherwise prefix match. Greedy backtracking over
    * the tiny pattern alphabet. */
  private[plans] def patternMatches(pattern: String,
      path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.substring(0, pattern.length - 1)
      else pattern
    // segments between '*' must appear in order; first segment at 0
    val parts = p.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < parts.length) {
      val part = parts(i)
      if (i == 0) {
        if (!path.startsWith(part)) return false
        pos = part.length
      } else if (i == parts.length - 1 && anchored) {
        // last segment must END the path (at or after pos)
        if (path.length - part.length < pos ||
          !path.endsWith(part)) return false
        pos = path.length
      } else {
        val at = path.indexOf(part, pos)
        if (at < 0) return false
        pos = at + part.length
      }
      i += 1
    }
    if (anchored) pos == path.length else true
  }

  def evaluate(robotsTxt: UTF8String, pathAndAgent: UTF8String)
      : GenericInternalRow = {
    // pathAndAgent = "<agent> <path>" (packed by the Column
    // front door so the expression stays binary)
    val pa = pathAndAgent.toString
    val sep = pa.indexOf(' ')
    val (agent, path) =
      if (sep < 0) ("*", pa)
      else (pa.substring(0, sep), pa.substring(sep + 1))
    val agentLower = agent.toLowerCase(java.util.Locale.ROOT)

    // parse groups
    final case class Group(agents: Seq[String],
      rules: Seq[(Boolean, String)]) // (isAllow, pattern)
    val groups = scala.collection.mutable.ArrayBuffer.empty[
      (Seq[String], scala.collection.mutable.ArrayBuffer[(Boolean, String)])]
    var curAgents = scala.collection.mutable.ArrayBuffer.empty[String]
    var inAgentRun = false
    robotsTxt.toString.split("\n", -1).foreach { line0 =>
      val line = {
        val h = line0.indexOf('#')
        (if (h >= 0) line0.substring(0, h) else line0)
          .stripSuffix("\r").trim
      }
      val c = line.indexOf(':')
      if (line.nonEmpty && c > 0) {
        val key = line.substring(0, c).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgentRun) curAgents =
              scala.collection.mutable.ArrayBuffer.empty[String]
            curAgents += value.toLowerCase(java.util.Locale.ROOT)
            inAgentRun = true
          case "allow" | "disallow" =>
            if (inAgentRun) {
              groups += ((curAgents.toSeq,
                scala.collection.mutable.ArrayBuffer
                  .empty[(Boolean, String)]))
              inAgentRun = false
            }
            if (groups.nonEmpty)
              groups.last._2 += ((key == "allow", value))
          case _ => () // crawl-delay, sitemap, unknown: ignored
        }
      }
    }
    if (inAgentRun) // trailing agent-only group (no rules)
      groups += ((curAgents.toSeq,
        scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]))

    // group selection: longest specific agent-token prefix; '*' only
    // when nothing specific matched; multiple groups for the same
    // agent merge (RFC 9309 §2.2.1)
    def agentScore(tokens: Seq[String]): Int =
      tokens.foldLeft(-1) { (best, t) =>
        // t.nonEmpty: a malformed empty `User-agent:` value would
        // prefix-match every agent at score 0 and beat the '*'
        // fallback group (round-16 advice item)
        if (t != "*" && t.nonEmpty && agentLower.startsWith(t) &&
            t.length > best)
          t.length else best
      }
    val bestScore = groups.map(g => agentScore(g._1))
      .foldLeft(-1)(math.max)
    val selected =
      if (bestScore >= 0)
        groups.filter(g => agentScore(g._1) == bestScore)
      else groups.filter(_._1.contains("*"))
    val rules = selected.flatMap(_._2)

    // longest-match, allow wins ties, empty disallow matches nothing
    var winLen = -1
    var winAllow = true
    var winRule = ""
    rules.foreach { case (isAllow, pat) =>
      if (pat.nonEmpty && patternMatches(pat, path)) {
        val len = pat.length
        if (len > winLen || (len == winLen && isAllow && !winAllow)) {
          winLen = len; winAllow = isAllow
          winRule = (if (isAllow) "allow:" else "disallow:") + pat
        }
      }
    }
    val allowed = if (winLen < 0) true else winAllow
    new GenericInternalRow(Array[Any](allowed,
      UTF8String.fromString(winRule), rules.length))
  }
}

/** `robots_eval(robotsTxt, "<agent> <path>")` →
  * struct(allowed, matched_rule, n_rules) — see [[RobotsKernel]];
  * the agent/path pack uses a space (product tokens never contain
  * one). */
case class RobotsEval(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = RobotsKernel.schema
  override def nullable: Boolean = left.nullable || right.nullable
  override def nullSafeEval(l: Any, r: Any): Any =
    RobotsKernel.evaluate(l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.plans.RobotsKernel.evaluate($l, $r);")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression) = copy(left = l, right = r)
  override def prettyName: String = "graft_robots_eval"
}
