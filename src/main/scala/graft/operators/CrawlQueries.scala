package graft.operators

import graft.{QueryPack, Tables}
import graft.functions.PortableHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-policy operators — the fetch-side gates a crawler runs BEFORE
  * any content enters the pipeline. First member: robots.txt evaluation
  * per RFC 9309 (the Robots Exclusion Protocol), the rule every polite
  * crawl applies to its entire frontier.
  *
  * The operator is the real thing, not a lookup: robots.txt TEXT is
  * parsed line-by-line (comments stripped anywhere on the line,
  * directive names case-insensitive, values trimmed), groups are
  * assembled per the RFC (consecutive User-agent lines stack onto one
  * group; a User-agent line after rules starts a new group; rules
  * before any User-agent line belong to no group and are ignored),
  * GROUP SELECTION picks the product-token group when one matches the
  * crawler and otherwise the `*` group — exclusively, never merged —
  * and per-URL evaluation applies LONGEST-MATCH-WINS with allow
  * breaking ties, `*` matching any octet sequence and `$` anchoring
  * the pattern end. Empty rule values are no-ops per the RFC.
  *
  * Scale shape: robots documents are per-host and tiny, so the parse +
  * group assembly is a small-frame pass (the only windows partition by
  * host over a robots file's own lines); the frontier join broadcasts
  * the selected rule set and the per-URL winner window partitions by
  * URL over at most |rules| rows. At 100 TB of frontier this is one
  * broadcast join + one narrow window — no corpus shuffle at all
  * until the final per-host audit aggregate.
  */
object CrawlQueries extends QueryPack {

  /** Parse robots.txt texts into per-(host, group) agents + rules and
    * evaluate a frontier of (doc_id, host, path) rows. Exposed for
    * RobotsSpec, which drives crafted policies through every RFC rule.
    * Returns (doc_id, host, path, allowed). */
  private[graft] def evalRobots(robots: DataFrame, frontier: DataFrame): DataFrame = {
    val byLine = Window.partitionBy("host").orderBy("ln")
    val lines = robots
      .select(col("host"), posexplode(split(col("content"), "\n")).as(Seq("ln", "raw")))
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*", "")))
      .filter(col("line") =!= "")
      .withColumn("directive",
        lower(regexp_extract(col("line"), "^([A-Za-z-]+)\\s*:", 1)))
      .withColumn("value", trim(regexp_extract(col("line"), ":(.*)$", 1)))
      .withColumn("is_ua", col("directive") === "user-agent")
      .withColumn("new_group",
        col("is_ua") && !coalesce(lag("is_ua", 1).over(byLine), lit(false)))
      .withColumn("gid", sum(when(col("new_group"), 1).otherwise(0)).over(byLine))

    val groups = lines.filter(col("is_ua"))
      .groupBy("host", "gid")
      .agg(collect_set(lower(col("value"))).as("agents"))
      .withColumn("is_bot", array_contains(col("agents"), Bot))
      .withColumn("is_star", array_contains(col("agents"), "*"))
    val hostHasBot = groups.groupBy("host")
      .agg(max(col("is_bot")).as("has_bot"))

    val rules = lines
      .filter(col("directive").isin("allow", "disallow") &&
        col("value") =!= "" && col("gid") > 0) // gid 0 = rules before any UA line: ignored
      .select(col("host"), col("gid"), col("directive").as("rtype"),
        col("value").as("pat"))
      .join(groups.select("host", "gid", "is_bot", "is_star"), Seq("host", "gid"))
      .join(hostHasBot, Seq("host"))
      .filter((col("has_bot") && col("is_bot")) || (!col("has_bot") && col("is_star")))
      .withColumn("rex", concat(
        lit("^"),
        regexp_replace(
          regexp_replace(
            when(col("pat").endsWith("$"),
              expr("substring(pat, 1, length(pat) - 1)")).otherwise(col("pat")),
            "\\.", "[.]"),
          "\\*", "(.*)"),
        when(col("pat").endsWith("$"), lit("$")).otherwise(lit(""))))
      .select(col("host"), col("rtype"), col("pat"), col("rex"),
        length(col("pat")).as("plen"))

    val matches = frontier
      .join(broadcast(rules), Seq("host"))
      .filter(expr("regexp_like(path, rex)"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("plen").desc, col("rtype"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("rtype"))
    frontier.join(matches, Seq("doc_id"), "left")
      .withColumn("allowed", coalesce(col("rtype") === "allow", lit(true)))
      .select("doc_id", "host", "path", "allowed")
  }

  /** The crawler's product token. */
  private[graft] val Bot = "graftbot"

  /** Closed-form robots.txt text for fixture host `h` (a Column): a
    * rules-before-any-group decoy the RFC says to ignore, an `otherbot`
    * group that must not apply, mixed-case directive names, mid-line
    * comments, blank lines, a `*` group, for EVEN hosts a `graftbot`
    * group that must then apply EXCLUSIVELY, and an empty Disallow
    * (a no-op per the RFC). */
  private def robotsText(h: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val star = concat(
      lit("# graft fixture\nDisallow: /everything # no group yet: ignored\n\n"),
      lit("User-Agent: otherbot\nDisallow: /\n\n"),
      lit("User-agent: *\n"),
      lit("Disallow: /private"), h, lit("/\n"),
      lit("allow: /private"), h, lit("/ok # mid-line comment\n"),
      lit("DISALLOW: /*.tmp$\n"))
    val bot = concat(
      lit("\nuser-agent: "), lit(Bot), lit("\n"),
      lit("disallow: /g"), h, lit("/\n"),
      lit("Allow: /g"), h, lit("/pub*\n"),
      lit("Disallow:\n")) // empty value: no-op
    when(h % 2 === 0, concat(star, bot)).otherwise(star)
  }

  /** Closed-form frontier path for a doc (host index `h`). The eight
    * path families exercise: no-rule default allow (0, 6), the
    * disallow prefix (1), the LONGER allow override (2), the wildcard
    * suffix rule star-dot-tmp-dollar (3), `$` anchoring strictness
    * (7, a .tmpx path, must NOT match), and on even hosts the
    * exclusive graftbot group (4
    * denied, 5 allowed by the longer wildcard allow; 1-3 revert to
    * ALLOWED because the `*` group no longer applies). */
  private def pathFor(id: org.apache.spark.sql.Column,
      h: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val p = id % 8
    when(p === 0, lit("/index"))
      .when(p === 1, concat(lit("/private"), h, lit("/page")))
      .when(p === 2, concat(lit("/private"), h, lit("/ok/page")))
      .when(p === 3, concat(lit("/file"), (id % 4).cast("string"), lit(".tmp")))
      .when(p === 4, concat(lit("/g"), h, lit("/secret")))
      .when(p === 5, concat(lit("/g"), h, lit("/pub/x")))
      .when(p === 6, concat(lit("/a/b"), h))
      .otherwise(lit("/file.tmpx"))
  }

  val queries: Map[String, Q] = Map(
    // RFC 9309 robots.txt evaluation over a synthetic frontier: six
    // hosts' policies are staged as TEXT (decoy pre-group rule,
    // non-matching otherbot group, mixed-case directives, comments, a
    // `*` group, and on even hosts a `graftbot` group that applies
    // exclusively), parsed and evaluated by the real operator; the
    // oracle never parses text — it replays the EFFECTIVE per-host
    // rule model and the same longest-match logic, so any slip in
    // parsing, group assembly or selection changes some host's
    // allowed/denied split or the denied checksum.
    "crawl_robots_filter" -> ((s, d) => {
      val h = col("doc_id") % 6
      val frontier = Tables.documents(s, d).select(
        col("doc_id"),
        concat(lit("h"), h.cast("string")).as("host"),
        pathFor(col("doc_id"), h.cast("string")).as("path"))
      val robots = Tables.documents(s, d)
        .select((col("doc_id") % 6).as("hh")).distinct()
        .select(concat(lit("h"), col("hh").cast("string")).as("host"),
          robotsText(col("hh")).as("content"))
      evalRobots(robots, frontier)
        .groupBy("host")
        .agg(
          count(lit(1)).as("n_urls"),
          sum(when(col("allowed"), 1L).otherwise(0L)).as("n_allowed"),
          sum(when(!col("allowed"), 1L).otherwise(0L)).as("n_denied"),
          coalesce(sum(when(!col("allowed"),
            PortableHash.h60p(col("doc_id").cast("string")))), lit(0L))
            .as("denied_checksum"))
        .orderBy("host")
    }))

  val oracleSql: Map[String, String] = Map(
    "crawl_robots_filter" ->
      s"""WITH hosts AS (SELECT unnest(range(6)) AS h),
            rules AS (
              SELECT h, 'disallow' AS rtype, '/private' || h || '/' AS pat FROM hosts WHERE h % 2 = 1
              UNION ALL SELECT h, 'allow', '/private' || h || '/ok' FROM hosts WHERE h % 2 = 1
              UNION ALL SELECT h, 'disallow', '/*.tmp$$' FROM hosts WHERE h % 2 = 1
              UNION ALL SELECT h, 'disallow', '/g' || h || '/' FROM hosts WHERE h % 2 = 0
              UNION ALL SELECT h, 'allow', '/g' || h || '/pub*' FROM hosts WHERE h % 2 = 0),
            rx AS (SELECT h, rtype, length(pat) AS plen,
                          '^' || CASE WHEN pat LIKE '%$$'
                                 THEN replace(replace(substr(pat, 1, length(pat) - 1), '.', '[.]'), '*', '(.*)') || '$$'
                                 ELSE replace(replace(pat, '.', '[.]'), '*', '(.*)') END AS rex
                   FROM rules),
            f AS (SELECT doc_id, doc_id % 6 AS h, 'h' || (doc_id % 6) AS host,
                         CASE CAST(doc_id % 8 AS INT)
                              WHEN 0 THEN '/index'
                              WHEN 1 THEN '/private' || (doc_id % 6) || '/page'
                              WHEN 2 THEN '/private' || (doc_id % 6) || '/ok/page'
                              WHEN 3 THEN '/file' || (doc_id % 4) || '.tmp'
                              WHEN 4 THEN '/g' || (doc_id % 6) || '/secret'
                              WHEN 5 THEN '/g' || (doc_id % 6) || '/pub/x'
                              WHEN 6 THEN '/a/b' || (doc_id % 6)
                              ELSE '/file.tmpx' END AS path
                  FROM documents),
            m AS (SELECT f.doc_id, r.rtype,
                         ROW_NUMBER() OVER (PARTITION BY f.doc_id
                           ORDER BY r.plen DESC, r.rtype) AS rk
                  FROM f JOIN rx r ON r.h = f.h AND regexp_matches(f.path, r.rex)),
            dec AS (SELECT f.doc_id, f.host,
                           COALESCE(w.rtype = 'allow', TRUE) AS allowed
                    FROM f LEFT JOIN (SELECT doc_id, rtype FROM m WHERE rk = 1) w
                    USING (doc_id))
          SELECT host, CAST(COUNT(*) AS BIGINT) AS n_urls,
                 CAST(SUM(CASE WHEN allowed THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed,
                 CAST(SUM(CASE WHEN allowed THEN 0 ELSE 1 END) AS BIGINT) AS n_denied,
                 CAST(COALESCE(SUM(CASE WHEN NOT allowed THEN ${PortableHash.h60pSql("CAST(doc_id AS VARCHAR)")} END), 0) AS BIGINT) AS denied_checksum
          FROM dec GROUP BY host ORDER BY host""")
}
