"""URL/domain curation operators: normalization semantics, registered-
domain extraction, blocklist filtering and canonical URL dedup (the
expression-level semantics are additionally hash-checked against
DuckDB through the `text_pii_scrub` url branch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.operators import web as W


def _norm(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], ["url"])
    return df.select(W.normalize_url(F.col("url")).alias("n")).first()["n"]


def test_normalize_url_semantics(spark):
    cases = {
        # scheme+host lowercase; path case preserved
        "HTTPS://WWW.Example.COM/Path/X": "https://www.example.com/Path/X",
        # default ports stripped, non-default kept
        "https://a.example:443/x": "https://a.example/x",
        "http://a.example:80/x": "http://a.example/x",
        "http://a.example:8080/x": "http://a.example:8080/x",
        # fragments dropped
        "https://a.example/x#top": "https://a.example/x",
        # tracking params stripped with ?/& chain repair
        "https://a.example/x?utm_source=f&id=1": "https://a.example/x?id=1",
        "https://a.example/x?id=1&utm_a=1&utm_b=2": "https://a.example/x?id=1",
        "https://a.example/x?gclid=9": "https://a.example/x",
        # tracker names with digits/underscores (utm_id, utm_abc123)
        "https://a.example/x?utm_id=7&id=1": "https://a.example/x?id=1",
        "https://a.example/x?utm_abc123=z": "https://a.example/x",
        "https://a.example/x?fbclid=1&id=2": "https://a.example/x?id=2",
        # trailing slashes
        "https://a.example/x/": "https://a.example/x",
        "https://a.example/": "https://a.example",
    }
    for raw, want in cases.items():
        assert _norm(spark, raw) == want, raw


def test_registered_domain_cc_slds(spark):
    rows = [("www.sub.site.co.uk",), ("www.example.com",), ("localhost",),
            ("a.b.c.site.com.au",), ("example.org",)]
    df = spark.createDataFrame(rows, ["host"])
    got = [r["d"] for r in
           df.select(W.registered_domain(F.col("host")).alias("d")).collect()]
    assert got == ["site.co.uk", "example.com", "localhost",
                   "site.com.au", "example.org"]


def test_registered_domain_suffix_list_swap(spark):
    """The cc_slds parameter IS the public-suffix hook: swapping in an
    org-level suffix list (github.io-style hosting suffixes) moves the
    registered-domain cut one label left, and the DuckDB twin —
    generated from the same tuple — agrees row for row."""
    import duckdb
    slds = ("github.io", "co.uk")
    hosts = ["user.github.io", "a.user.github.io", "github.io",
             "www.site.co.uk", "plain.example.com", "bare"]
    want = ["user.github.io", "user.github.io", "github.io",
            "site.co.uk", "example.com", "bare"]
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])
    got = [r["d"] for r in df.select(
        W.registered_domain(F.col("host"), cc_slds=slds).alias("d"))
        .collect()]
    assert got == want
    con = duckdb.connect()
    sql = W.SQL_REGISTERED_DOMAIN("host", cc_slds=slds)
    duck = [con.execute(f"SELECT {sql} FROM (SELECT ? AS host)",
                        [h]).fetchone()[0] for h in hosts]
    con.close()
    assert duck == want


_PSL_TEXT = """\
// ===BEGIN ICANN DOMAINS===
com
org
uk
co.uk
// ck has no registrable second level except www.ck
*.ck
!www.ck
jp
kobe.jp
*.kobe.jp
!city.kobe.jp
// ===END ICANN DOMAINS===
github.io   // org-level entry (private section style)
"""


def test_load_suffix_rules_parses_psl_format():
    exact, wild, exc = W.load_suffix_rules(_PSL_TEXT)
    assert "co.uk" in exact and "github.io" in exact and "com" in exact
    assert set(wild) == {"ck", "kobe.jp"}
    assert set(exc) == {"www.ck", "city.kobe.jp"}
    assert not any(s.startswith("//") for s in exact)


def test_registered_domain_psl_algorithm(spark):
    """The publicsuffix.org test-vector semantics: longest rule wins,
    wildcards count one label past their printed form, exceptions
    beat everything and resolve to themselves, unmatched hosts use
    the implicit '*' root rule."""
    rules = W.load_suffix_rules(_PSL_TEXT)
    cases = {
        "example.com": "example.com",              # exact 'com'
        "www.example.com": "example.com",
        "sub.site.co.uk": "site.co.uk",            # longest: co.uk > uk
        "a.b.example.ck": "b.example.ck",          # wildcard *.ck
        "www.ck": "www.ck",                        # exception beats *.ck
        "x.www.ck": "www.ck",
        # *.kobe.jp: news.kobe.jp IS a public suffix (resolves to
        # itself by the single-label convention); its direct child is
        # the registrable domain (publicsuffix.org test vectors)
        "news.kobe.jp": "news.kobe.jp",
        "a.news.kobe.jp": "a.news.kobe.jp",
        "b.a.news.kobe.jp": "a.news.kobe.jp",
        "city.kobe.jp": "city.kobe.jp",            # exception
        "b.city.kobe.jp": "city.kobe.jp",
        "user.github.io": "user.github.io",        # private-section entry
        "nomatch.zz": "nomatch.zz",                # implicit '*' rule
        "deep.nomatch.zz": "nomatch.zz",
        "localhost": "localhost",                  # single label
        "UPPER.Example.COM": "example.com",        # lowercased
    }
    df = spark.createDataFrame([(h,) for h in cases], ["host"])
    out = {r["host"]: r["registered_domain"]
           for r in W.registered_domain_psl(df, rules).collect()}
    for host, want in cases.items():
        assert out[host] == want, f"{host}: {out[host]!r} != {want!r}"


def _ref_psl(host, exact, wild, exc):
    """Independent reference of the publicsuffix.org algorithm with
    the engine's no-registrable convention (a host that IS a public
    suffix resolves to itself). Written set-theoretically — match all
    rules, exceptions dominate, else longest with wildcards counting
    one past their printed labels, else the implicit '*' rule."""
    labels = host.lower().split(".")

    def ends_with(rule):
        rl = rule.split(".")
        return len(labels) >= len(rl) and labels[-len(rl):] == rl

    exc_hits = [r for r in exc if ends_with(r)]
    if exc_hits:
        reg = max(len(r.split(".")) for r in exc_hits)
        return ".".join(labels[-min(reg, len(labels)):])
    ps = 1                                   # implicit '*' rule
    for r in exact:
        if ends_with(r):
            ps = max(ps, len(r.split(".")))
    for r in wild:
        if ends_with(r):
            ps = max(ps, len(r.split(".")) + 1)
    return ".".join(labels[-min(ps + 1, len(labels)):])


def test_registered_domain_psl_fuzz_vs_reference(spark):
    """Seeded fuzz: random rule tables (exact/wildcard/exception over
    a small label alphabet) and random hosts, engine vs the
    independent reference — every divergence in match priority,
    wildcard arithmetic or the clamped no-registrable convention
    shows up here."""
    import random
    rng = random.Random(61)
    alphabet = ["a", "b", "co", "uk", "io", "x"]

    def suffix(n):
        return ".".join(rng.choice(alphabet) for _ in range(n))

    for trial in range(6):
        exact = tuple({suffix(rng.randint(1, 2)) for _ in range(4)})
        wild = tuple({suffix(rng.randint(1, 2)) for _ in range(2)})
        exc = tuple({rng.choice(alphabet) + "." + w for w in wild[:1]})
        hosts = list({".".join(rng.choice(alphabet)
                               for _ in range(rng.randint(1, 5)))
                      for _ in range(60)})
        df = spark.createDataFrame([(h,) for h in hosts], ["host"])
        got = {r["host"]: r["registered_domain"] for r in
               W.registered_domain_psl(df, (exact, wild, exc),
                                       max_labels=4).collect()}
        for h in hosts:
            want = _ref_psl(h, exact, wild, exc)
            assert got[h] == want, (trial, h, exact, wild, exc,
                                    got[h], want)


def test_registered_domain_psl_agrees_with_simple_cut(spark):
    """On the simple ccSLD tier the broadcast-join path and the
    literal-isin path compute the same registered domain — the two
    implementations are swappable at the blocklist call site."""
    rules = (W.CC_SLDS, (), ())
    hosts = ["www.sub.site.co.uk", "www.example.com", "a.b.c.site.com.au",
             "example.org", "x.y.co.jp"]
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])
    via_join = {r["host"]: r["registered_domain"]
                for r in W.registered_domain_psl(df, rules).collect()}
    via_isin = {r["host"]: r["d"] for r in df.select(
        "host", W.registered_domain(F.col("host")).alias("d")).collect()}
    assert via_join == via_isin


def test_domain_filter_broadcast_anti_join(spark):
    rows = [(1, "https://KEEP.example/a"),
            (2, "https://bad.example/b?utm_x=1"),
            (3, "https://sub.bad.example/c"),
            (4, "https://ok.example/d")]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    blocked = spark.createDataFrame([("bad.example",)], ["domain"])
    out = W.domain_filter(df, blocked)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 4]
    # the blocklist side must be broadcast — no corpus shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_domain_filter_psl_blocks_org_level(spark):
    """With PSL rules, a blocklist can name an ORG-level domain under
    a hosting suffix: 'user.github.io' blocks that user's pages while
    other users on the same suffix pass. The naive last-two-labels
    cut collapses every *.github.io host to 'github.io' and either
    misses the block or (if github.io itself were listed) nukes every
    user — the exact failure the PSL path fixes."""
    rules = W.load_suffix_rules(_PSL_TEXT)
    rows = [(1, "https://user.github.io/p1"),
            (2, "https://USER.github.io/p2?utm_id=1"),
            (3, "https://other.github.io/p3"),
            (4, "https://example.com/p4")]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    blocked = spark.createDataFrame([("user.github.io",)], ["domain"])
    got = sorted(r["doc_id"] for r in
                 W.domain_filter(df, blocked, psl_rules=rules).collect())
    assert got == [3, 4]
    # the naive cut misses the same blocklist entirely
    naive = sorted(r["doc_id"] for r in
                   W.domain_filter(df, blocked).collect())
    assert naive == [1, 2, 3, 4]


def test_url_dedup_canonical_keep(spark):
    rows = [(5, "https://a.example/p?utm_source=x"),   # dup of 1 after norm
            (1, "HTTPS://A.EXAMPLE/p"),
            (3, "https://a.example/p#frag"),           # dup too
            (2, "https://a.example/q")]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    kept = sorted(r["doc_id"] for r in W.url_dedup(df).collect())
    assert kept == [1, 2]                              # min-id canonical
    # idempotent
    assert sorted(r["doc_id"]
                  for r in W.url_dedup(W.url_dedup(df)).collect()) == [1, 2]


def test_normalize_url_null_and_garbage(spark):
    df = spark.createDataFrame([(None,), ("no scheme here",), ("",)],
                               "url string")
    got = df.select(W.normalize_url(F.col("url")).alias("n"),
                    W.url_host(W.normalize_url(F.col("url"))).alias("h"))
    rows = got.collect()
    assert rows[0]["n"] is None
    # garbage without a scheme falls back to text-up-to-'/:?#' — a
    # nonsense "host" that matches no blocklist entry, rather than an
    # empty host that would silently pass every domain filter
    assert rows[1]["n"] == "no scheme here" and rows[1]["h"] == "no scheme here"
    assert rows[2]["n"] == "" and rows[2]["h"] == ""


def test_url_host_schemeless_fallback(spark):
    """Schemeless and protocol-relative URLs still resolve a host (the
    blocklist must not depend on the scheme being present), userinfo
    and ports are still stripped, and the fallback lowercases (the
    normalizer can't — it never saw an authority)."""
    cases = {
        "example.com/x": "example.com",
        "//Blocked.COM/x?id=1": "blocked.com",
        "user:pass@Example.com:8080/p": "example.com",
        "//a.b.example": "a.b.example",
        "http:///x": "",              # scheme present, empty authority
        "site.org": "site.org",
    }
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = [r["h"] for r in df.select(
        W.url_host(W.normalize_url(F.col("url"))).alias("h")).collect()]
    assert got == list(cases.values())


def test_domain_filter_catches_schemeless_blocked(spark):
    rows = [(1, "https://ok.example/a"),
            (2, "bad.example/x"),                 # schemeless
            (3, "//sub.bad.example/y?utm_id=1")]  # protocol-relative
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    blocked = spark.createDataFrame([("bad.example",)], ["domain"])
    assert sorted(r["doc_id"]
                  for r in W.domain_filter(df, blocked).collect()) == [1]


def test_url_host_matches_urllib_reference(spark):
    """Seeded differential vs the stdlib reference: for every
    generated URL, url_host(normalize_url(u)) must equal
    urllib.parse.urlsplit(u).hostname (lowercased host, userinfo and
    port stripped) — the public-contract definition of 'host'."""
    import random
    from urllib.parse import urlsplit

    rng = random.Random(41)
    schemes = ["http", "https", "HTTPS", "ftp"]
    hosts = ["Example.COM", "sub.site.co.uk", "a.b.example", "X.Y",
             "bare", "WWW.Mixed.Case.Org"]
    userinfos = ["", "user@", "User:Pass@", "a.b@"]
    ports = ["", ":8080", ":443", ":80"]
    paths = ["", "/", "/a/b", "/a/b/", "/x%20y"]
    queries = ["", "?id=1", "?utm_source=x&id=2", "?next=/home/"]
    frags = ["", "#top", "#a/b"]
    urls = []
    for _ in range(120):
        urls.append(rng.choice(schemes) + "://" + rng.choice(userinfos)
                    + rng.choice(hosts) + rng.choice(ports)
                    + rng.choice(paths) + rng.choice(queries)
                    + rng.choice(frags))
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = [r["h"] for r in df.select(
        W.url_host(W.normalize_url(F.col("url"))).alias("h")).collect()]
    for u, h in zip(urls, got):
        want = urlsplit(u).hostname or ""
        assert h == want, f"{u}: {h!r} != {want!r}"


def test_normalize_url_idempotent(spark):
    """normalize(normalize(u)) == normalize(u): the rule chain must be
    a projection — a second pass changes nothing, so re-normalizing
    already-canonical URLs (e.g. on snapshot re-ingest) is safe."""
    import random
    rng = random.Random(53)
    parts = (["http", "https", "HTTPS"],
             ["", "User:Pass@", "a.b@"],
             ["Example.COM", "sub.site.co.uk", "X.Y"],
             ["", ":443", ":80", ":8080"],
             ["", "/", "/a/b/", "/x//", "/p"],
             ["", "?id=1", "?utm_source=x", "?utm_a=1&utm_b=2&id=3",
              "?next=/h/"],
             ["", "#f", "#a/b/"])
    urls = ["".join([rng.choice(parts[0]) + "://"] +
                    [rng.choice(p) for p in parts[1:]])
            for _ in range(150)]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    once = W.normalize_url(F.col("url"))
    rows = df.select(once.alias("n1"),
                     W.normalize_url(once).alias("n2")).collect()
    for u, r in zip(urls, rows):
        assert r["n1"] == r["n2"], f"{u}: {r['n1']!r} -> {r['n2']!r}"
