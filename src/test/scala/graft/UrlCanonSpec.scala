package graft

import org.apache.spark.sql.functions._

import graft.ops.UrlCanon

/** Hand-computed canonicalizations + dedup/cap behavior for the x90
  * URL curation stage.
  */
class UrlCanonSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toSeq.toDF("u")
      .select(UrlCanon.canonicalizeUrl($"u").as("c"))
      .as[String].collect().toSeq

  test("canonicalizeUrl: hand-computed forms") {
    assert(canon(
      "HTTPS://WWW.Ex.COM/Path/To?utm_source=a&id=3&utm_campaign=b#frag",
      "http://ex.com/?utm_a=1",
      "Https://EX.com/CaseSensitive/Path",
      "https://www.a.com/x?gclid=z&id=1&fbclid=q",
      "https://a.com/x?id=1&id=2",
      "https://WWW.a.com#only-frag",
      "http://wwwx.com/keeps-host",
      "https://a.com/trailing/",
      "not a url") === Seq(
      // scheme+host fold, www strip, tracking params out of every
      // position, fragment gone, path case preserved
      "https://ex.com/Path/To?id=3",
      "http://ex.com", // tracking-only query then trailing slash
      "https://ex.com/CaseSensitive/Path",
      "https://a.com/x?id=1",
      "https://a.com/x?id=1&id=2", // non-tracking params untouched
      "https://a.com",
      "http://wwwx.com/keeps-host", // www strip needs the dot
      "https://a.com/trailing",
      "")) // no scheme://host prefix -> canonical form is empty
  }

  test("dedupWithDomainCap: survivor ids, duplicate counts, per-domain rank cap") {
    // three raw spellings of ONE canonical a.com/x; two more a.com urls
    // (cap 2 keeps the first two by survivor id); one b.com url
    val urls = Seq(
      (10L, "https://a.com/x"),
      (7L, "HTTPS://WWW.a.com/x#f"),
      (12L, "https://a.com/x?utm_source=z"),
      (3L, "https://a.com/y"),
      (9L, "https://a.com/z"),
      (5L, "http://b.com/q")).toDF("doc_id", "url")
    val got = UrlCanon.dedupWithDomainCap(urls, "doc_id", "url", cap = 2)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("a.com", "https://a.com/y", 3L, 1L, 1L),
      ("a.com", "https://a.com/x", 7L, 3L, 2L),
      ("b.com", "http://b.com/q", 5L, 1L, 1L)))
    // a.com/z (first_doc 9) fell to the cap; scheme is not part of the
    // domain key, so http and https b-urls would share one budget
  }

  test("domainBlocklistGate (x123): exact hit, proper-suffix hit, " +
      "multi-rule min, zero-hit keep") {
    val blocked = Seq("bad.com", "ads.bad.com", "tracker.net")
    val urls = Seq(
      (1L, "https://bad.com/x"), // exact entry
      (2L, "HTTP://WWW.Sub.Bad.COM/y#f"), // proper suffix (+canon chain)
      (3L, "https://ads.bad.com/z"), // BOTH entries match: min rule wins
      (4L, "https://good.com/a?utm_source=t"), // zero hits
      (5L, "https://notbad.com/b")) // suffix match needs the dot
      .toDF("doc_id", "url")
    val got = UrlCanon.domainBlocklistGate(urls, "doc_id", "url", blocked)
      .as[(Long, String, Long, Option[String], Long)].collect().toSet
    assert(got === Set(
      (1L, "bad.com", 1L, Some("bad.com"), 0L),
      (2L, "sub.bad.com", 1L, Some("bad.com"), 0L),
      (3L, "ads.bad.com", 2L, Some("ads.bad.com"), 0L),
      (4L, "good.com", 0L, None, 1L),
      (5L, "notbad.com", 0L, None, 1L)))
  }

  test("domainBlocklistGate r14 contract: entries normalize like the " +
      "canonical host; unparseable URLs fail CLOSED with defined flags") {
    // an uppercase www-prefixed entry must still gate its domain —
    // the r13 spelling silently matched nothing (canonical hosts are
    // lowercase and never www.-prefixed)
    val urls = Seq(
      (1L, "https://bad.com/x"),
      (2L, "https://sub.bad.com/y"),
      (3L, null.asInstanceOf[String]), // NULL url
      (4L, "not a url at all"), // no scheme — canon yields no host
      (5L, "https://good.com/ok"))
      .toDF("doc_id", "url")
    val got = UrlCanon.domainBlocklistGate(urls, "doc_id", "url",
        Seq("WWW.Bad.COM", "www.bad.com", "Tracker.Net"))
      .as[(Long, Option[String], Long, Option[String], Long)]
      .collect().toSet
    // both messy spellings normalize (and dedupe) to bad.com
    assert(got.filter(r => r._1 == 1L || r._1 == 2L)
      .forall(r => r._3 == 1L && r._4 == Some("bad.com") && r._5 == 0L))
    // unparseable rows: n_rules/keep are DEFINED (0, fail-closed),
    // never null; the (keep=0, n_rules=0) pair is the unparseable
    // signature, distinct from a rule-blocked row's (0, >=1)
    val unparseable = got.filter(r => r._1 == 3L || r._1 == 4L)
    assert(unparseable.size === 2)
    assert(unparseable.forall(r =>
      r._3 == 0L && r._4.isEmpty && r._5 == 0L),
      s"unparseable rows not fail-closed: $unparseable")
    // a clean keeper is untouched
    assert(got.exists(r => r._1 == 5L && r._3 == 0L && r._5 == 1L))
  }

  test("domainBlocklistGateJoin (x129) is row-identical to the " +
      "plan-literal gate on the same list (the production-config pin)") {
    import spark.implicits._
    // the x123/x129 fixture list, in the messy spelling both gates
    // must normalize identically
    val list = Seq("WWW.Src3.Example.COM", "src11.example.com",
      "SRC11.EXAMPLE.COM", "cdn.src5.example.com",
      "www.tracker.example.net")
    val urls = Seq(
      (1L, "https://src3.example.com/a"),
      (2L, "https://cdn.src3.example.com/b"),
      (3L, "https://cdn.src5.example.com/c"),
      (4L, "https://src5.example.com/d"), // bare src5 keeps
      (5L, "https://good.example.org/e"),
      (6L, null.asInstanceOf[String]), // unparseable: both fail closed
      (7L, "garbage"))
      .toDF("doc_id", "url")
    val litGate = UrlCanon.domainBlocklistGate(urls, "doc_id", "url",
        list)
      .as[(Long, Option[String], Long, Option[String], Long)]
      .collect().toSet
    val joinGate = UrlCanon.domainBlocklistGateJoin(urls, "doc_id",
        "url", list.toDF("rule"), "rule")
      .as[(Long, Option[String], Long, Option[String], Long)]
      .collect().toSet
    assert(joinGate === litGate)
    // and on the real fixture corpus (the x123 input), end to end
    val docs = Tables.load(spark, sf0001, "documents")
      .filter($"text".isNotNull)
      .select($"doc_id",
        concat(lit("https://src"),
          pmod($"doc_id", lit(16)).cast("string"),
          lit(".example.com/p/"), $"doc_id".cast("string")).as("url"))
    val a = UrlCanon.domainBlocklistGate(docs, "doc_id", "url", list)
      .as[(Long, Option[String], Long, Option[String], Long)]
      .collect().toSet
    val b = UrlCanon.domainBlocklistGateJoin(docs, "doc_id", "url",
        list.toDF("rule"), "rule")
      .as[(Long, Option[String], Long, Option[String], Long)]
      .collect().toSet
    assert(a === b)
  }

  test("domainSplit (x131): split is a pure function of domain — no " +
      "domain straddles splits; unparseable trains; rates sane") {
    import spark.implicits._
    val docs = Tables.load(spark, sf0001, "documents")
      .filter($"text".isNotNull)
      .select($"doc_id",
        concat(lit("https://src"),
          pmod($"doc_id", lit(16)).cast("string"),
          lit(".example.com/p/"), $"doc_id".cast("string")).as("url"))
      .union(Seq((100001L, null.asInstanceOf[String]),
        (100002L, "no scheme here")).toDF("doc_id", "url"))
    val got = UrlCanon.domainSplit(docs, "doc_id", "url",
        valRate = 0.2, testRate = 0.2)
      .as[(Long, Option[String], String)].collect()
    // leakage invariant: one split per domain
    val perDomain = got.filter(_._2.exists(_.nonEmpty))
      .groupBy(_._2).map { case (_, rs) => rs.map(_._3).distinct.size }
    assert(perDomain.forall(_ == 1), "a domain straddles splits")
    // unparseable rows (null url / no host) land in train
    assert(got.filter(r => r._1 >= 100001L)
      .forall(r => r._3 == "train"))
    // all three labels are from the closed set; train is non-empty
    assert(got.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    assert(got.count(_._3 == "train") > 0)
    // determinism: re-run is identical
    val rerun = UrlCanon.domainSplit(docs, "doc_id", "url", 0.2, 0.2)
      .as[(Long, Option[String], String)].collect()
    assert(rerun.sortBy(_._1).sameElements(got.sortBy(_._1)))
  }

  test("domainChurnReport (x151): set arithmetic on a hand snapshot " +
      "pair; canonicalization folds www/case; one-sided strata " +
      "publish Jaccard 0") {
    // stratum X: old {a.com, b.com}, new {b.com, c.com, d.com}
    //   → shared 1, added 2, removed 1, J = 1/4 = 250000
    //   (www.B.com must fold into b.com for `shared` to be 1)
    // stratum O: old-only → n_new 0, J = 0 div n_old = 0
    val old = Seq(
      ("X", "http://a.com/p1"), ("X", "http://www.B.com/p2"),
      ("X", "http://a.com/p3"),
      ("O", "http://solo.org/q")).toDF("src", "url")
    val nw = Seq(
      ("X", "https://b.com/p4"), ("X", "http://c.com/p5"),
      ("X", "http://d.com/p6")).toDF("src", "url")
    val got = UrlCanon.domainChurnReport(old, nw, "src", "url")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().toSet
    assert(got === Set(
      ("X", 2L, 3L, 1L, 2L, 1L, 250000L),
      ("O", 1L, 0L, 0L, 0L, 1L, 0L)))
  }
}
