"""Domain PageRank over the link graph (W4): numpy differential,
mass conservation, dangling redistribution, edge extraction, and the
NL target."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamic_etl_pipeline_thesis_ii_spark.operators.web import (
    domain_pagerank,
    link_edges,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _numpy_pagerank(pairs, n_iter=10, d=0.85):
    import numpy as np

    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {v: 0 for v in nodes}
    for s, _t in pairs:
        out[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nxt = np.zeros(n)
        dangling = sum(r[idx[v]] for v in nodes if out[v] == 0)
        for s, t in pairs:
            nxt[idx[t]] += r[idx[s]] / out[s]
        r = (1.0 - d) / n + d * (nxt + dangling / n)
    return {v: round(float(r[idx[v]]), 8) for v in nodes}


def test_numpy_differential_and_mass_conservation(spark):
    """Spark ranks == an independent numpy power iteration to 8 dp on
    a graph with a hub, a cycle, and a dangling node; total mass
    stays 1."""
    pairs = [("a.com", "b.com"), ("a.com", "c.com"),
             ("b.com", "c.com"), ("c.com", "a.com"),
             ("d.com", "c.com"), ("e.com", "c.com"),
             ("c.com", "sink.com")]          # sink.com dangles
    got = {r["domain"]: r["rank"]
           for r in domain_pagerank(_edges(spark, pairs)).collect()}
    want = _numpy_pagerank(pairs)
    assert got == want
    assert abs(sum(got.values()) - 1.0) < 1e-6
    # the hub (c.com: 4 in-links) outranks everything else
    assert got["c.com"] == max(got.values())


def test_in_degree_and_empty_graph(spark):
    pairs = [("a.com", "b.com"), ("c.com", "b.com")]
    out = {r["domain"]: (r["rank"], r["in_degree"])
           for r in domain_pagerank(_edges(spark, pairs)).collect()}
    assert out["b.com"][1] == 2 and out["a.com"][1] == 0
    assert domain_pagerank(_edges(spark, [])).count() == 0


def test_link_edges_extraction(spark):
    """URL-normalized registered-domain edges: tracking params and
    case fold away, self-edges and nulls drop, duplicates collapse."""
    pages = spark.createDataFrame(
        [("https://Blog.Example.COM/post?utm_source=x",
          ["https://other.org/a", "https://example.com/self",
           "https://other.org/b?utm_id=1", None]),
         ("https://example.com/about", ["https://third.net/"]),
         (None, ["https://nowhere.org/"])],
        "url string, links array<string>")
    got = {(r["src"], r["dst"]) for r in link_edges(pages).collect()}
    assert got == {("example.com", "other.org"),
                   ("example.com", "third.net")}


def test_nl_domain_rank_target(spark, tmp_path):
    """'rank the domains by the link graph at /p': routing, ranked
    output at the sink, top-domain report, and rejections."""
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )

    p = parse_dataops_query(
        "rank the domains by the link graph at /g, 5 iterations")
    assert p == {"target": "domain_rank", "edges_path": "/g",
                 "method": "pagerank", "n_iter": 5}
    assert parse_dataops_query(
        "pagerank the domains using the link graph at /g")["target"] \
        == "domain_rank"
    ph = parse_dataops_query(
        "rank the domains by harmonic centrality using the link "
        "graph at /g")
    assert ph["method"] == "harmonic" and ph["n_iter"] == 8

    edges_dir = str(tmp_path / "graph")
    _edges(spark, [("a.com", "b.com"), ("c.com", "b.com"),
                   ("b.com", "a.com")]).write.parquet(edges_dir)
    sf_dir = str(tmp_path / "src")
    spark.createDataFrame([(1, "x")], "doc_id bigint, text string") \
        .write.parquet(sf_dir + "/documents.parquet")
    pipe = Pipeline(spark, FixtureFetcher(spark, sf_dir))
    out = str(tmp_path / "ranks")
    res = pipe.run_dataops(
        f"rank the domains by the link graph at {edges_dir}",
        sf_dir, out)
    assert res["status"] == "complete"
    rep = res["reports"]
    assert rep["n_domains"] == 3
    back = {r["domain"]: r["rank"]
            for r in spark.read.parquet(out).collect()}
    assert abs(sum(back.values()) - 1.0) < 1e-6
    # report's top domain is the argmax of the persisted ranks
    assert rep["top_domains"][0]["domain"] \
        == max(back, key=lambda d: back[d])
    # rejections: no path / unreadable path
    r1 = pipe.run_dataops("rank the domains by the link graph",
                          sf_dir, str(tmp_path / "o1"))
    assert r1["status"] == "rejected" and "graph path" in r1["reason"]
    r2 = pipe.run_dataops(
        f"rank the domains by the link graph at {tmp_path}/nope",
        sf_dir, str(tmp_path / "o2"))
    assert r2["status"] == "rejected" and "no link graph" in r2["reason"]


def test_harmonic_hyperball_vs_exact_bfs(spark):
    """HyperBall harmonic == exact BFS harmonic within the HLL band
    (exact on small cardinalities) on a graph with hubs, chains and
    unreachable nodes; reachable counts exact."""
    from collections import defaultdict, deque

    from dynamic_etl_pipeline_thesis_ii_spark.operators.web import (
        domain_harmonic,
    )

    pairs = [("a", "c"), ("b", "c"), ("d", "c"), ("c", "e"),
             ("e", "f"), ("b", "a"), ("f", "a")]
    got = {r["domain"]: (r["harmonic"], r["reachable"])
           for r in domain_harmonic(
               _edges(spark, pairs), max_radius=6).collect()}
    radj = defaultdict(list)
    nodes = set()
    for s, t in pairs:
        radj[t].append(s)
        nodes |= {s, t}

    def harm(v):
        dist, q, h = {v: 0}, deque([v]), 0.0
        while q:
            x = q.popleft()
            for p in radj[x]:
                if p not in dist:
                    dist[p] = dist[x] + 1
                    q.append(p)
                    h += 1.0 / dist[p]
        return h, len(dist) - 1

    for v in sorted(nodes):
        e_h, e_r = harm(v)
        g_h, g_r = got[v]
        assert abs(g_h - e_h) <= 0.05 * max(e_h, 1.0), v
        assert g_r == e_r, v
    # the hub (c) is the most central
    assert max(got, key=lambda d: got[d][0]) == "c"


def test_harmonic_radius_truncation_and_direction(spark):
    """max_radius truncates contributions beyond r hops;
    incoming=False measures outgoing reach instead."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.web import (
        domain_harmonic,
    )

    chain = [("a", "b"), ("b", "c"), ("c", "d")]
    r1 = {r["domain"]: r["harmonic"] for r in domain_harmonic(
        _edges(spark, chain), max_radius=1).collect()}
    # radius 1: each node scores 1.0 per direct in-link only
    assert r1 == {"a": 0.0, "b": 1.0, "c": 1.0, "d": 1.0}
    r3 = {r["domain"]: r["harmonic"] for r in domain_harmonic(
        _edges(spark, chain), max_radius=3).collect()}
    assert abs(r3["d"] - (1.0 + 0.5 + 1 / 3)) < 1e-3
    out3 = {r["domain"]: r["harmonic"] for r in domain_harmonic(
        _edges(spark, chain), max_radius=3,
        incoming=False).collect()}
    assert abs(out3["a"] - (1.0 + 0.5 + 1 / 3)) < 1e-3
    assert out3["d"] == 0.0


def test_nl_harmonic_rank_target(spark, tmp_path):
    """'rank the domains by harmonic centrality ...' runs HyperBall
    and reports the hub first."""
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
    )

    edges_dir = str(tmp_path / "graph")
    _edges(spark, [("a.com", "hub.com"), ("b.com", "hub.com"),
                   ("c.com", "hub.com"), ("hub.com", "a.com")]) \
        .write.parquet(edges_dir)
    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "x")], "doc_id bigint, text string") \
        .write.parquet(src + "/documents.parquet")
    pipe = Pipeline(spark, FixtureFetcher(spark, src))
    out = str(tmp_path / "ranks")
    res = pipe.run_dataops(
        f"rank the domains by harmonic centrality using the link "
        f"graph at {edges_dir}", src, out)
    assert res["status"] == "complete"
    assert res["reports"]["method"] == "harmonic"
    assert res["reports"]["top_domains"][0]["domain"] == "hub.com"
    cols = set(spark.read.parquet(out).columns)
    assert cols == {"domain", "harmonic", "reachable"}


def test_html_links_and_page_link_edges(spark):
    """href extraction: double/single quotes, relative links die in
    the normalize chain, self-domain links drop."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.web import (
        html_links,
        page_link_edges,
    )

    html = ('<a href="https://Other.ORG/a?utm_source=x">x</a> '
            "<a href='https://third.net/b'>y</a> "
            '<a href="/relative/path">z</a> '
            '<a href="https://example.com/self">s</a>')
    pages = spark.createDataFrame(
        [("https://example.com/page", html)], "url string, html string")
    links = pages.select(html_links(F.col("html")).alias("l")) \
        .first()["l"]
    assert len(links) == 4 and "/relative/path" in links
    got = {(r["src"], r["dst"])
           for r in page_link_edges(pages).collect()}
    assert got == {("example.com", "other.org"),
                   ("example.com", "third.net")}


def test_nl_link_graph_build_then_rank(spark, tmp_path):
    """The crawl -> graph -> rank pipeline through nothing but
    run_dataops: build the link graph from a synthetic WARC, then
    rank the domains from its output."""
    import gzip

    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
        parse_dataops_query,
    )

    p = parse_dataops_query(
        "build the link graph from the crawl at /c")
    assert p == {"target": "link_graph_build", "crawl_path": "/c"}
    # the bare crawl door keeps its route
    assert parse_dataops_query(
        "extract text from the crawl at /c")["target"] == "ingest_crawl"

    def record(headers, block):
        head = "".join(f"{k}: {v}\r\n" for k, v in headers.items())
        return (f"WARC/1.0\r\n{head}Content-Length: {len(block)}"
                "\r\n\r\n".encode() + block + b"\r\n\r\n")

    def response(uri, rid, body):
        http = (f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
                .encode("latin-1") + body)
        return record({"WARC-Type": "response",
                       "WARC-Record-ID": f"<urn:uuid:{rid}>",
                       "WARC-Target-URI": uri,
                       "WARC-Date": "2026-01-02T03:04:05Z",
                       "Content-Type":
                           "application/http; msgtype=response"},
                      http)

    warc = (
        response("https://a.com/1", 1,
                 b'<a href="https://hub.com/x">h</a>'
                 b'<a href="https://b.com/y">b</a>')
        + response("https://b.com/1", 2,
                   b'<a href="https://hub.com/z">h</a>')
        + response("https://c.com/1", 3,
                   b'<a href="https://hub.com/w">h</a>'
                   b'<a href="/self">s</a>'))
    crawl = str(tmp_path / "crawl")
    import os
    os.makedirs(crawl)
    with open(os.path.join(crawl, "part-0.warc.gz"), "wb") as fh:
        fh.write(gzip.compress(warc))

    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "x")], "doc_id bigint, text string") \
        .write.parquet(src + "/documents.parquet")
    pipe = Pipeline(spark, FixtureFetcher(spark, src))
    graph = str(tmp_path / "graph")
    res = pipe.run_dataops(
        f"build the link graph from the crawl at {crawl}", src, graph)
    assert res["status"] == "complete"
    rep = res["reports"]
    assert rep["n_pages"] == 3 and rep["n_edges"] == 4
    assert rep["n_domains"] == 4
    got = {(r["src"], r["dst"])
           for r in spark.read.parquet(graph).collect()}
    assert got == {("a.com", "hub.com"), ("a.com", "b.com"),
                   ("b.com", "hub.com"), ("c.com", "hub.com")}
    # chain: rank the freshly-built graph
    out = str(tmp_path / "ranks")
    res2 = pipe.run_dataops(
        f"rank the domains by the link graph at {graph}", src, out)
    assert res2["status"] == "complete"
    assert res2["reports"]["top_domains"][0]["domain"] == "hub.com"
    # rejection: no path
    r1 = pipe.run_dataops("build the link graph from the crawl",
                          src, str(tmp_path / "o1"))
    assert r1["status"] == "rejected" and "crawl path" in r1["reason"]


def test_weighted_pagerank(spark):
    """A weight column splits rank by out-strength: tripling one
    edge's weight must pull rank toward its target, and the weighted
    run equals an unweighted run over multiplied edge rows."""
    from dynamic_etl_pipeline_thesis_ii_spark.operators.web import (
        domain_pagerank,
    )

    w = spark.createDataFrame(
        [("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0),
         ("c", "a", 1.0)],
        "src string, dst string, weight double")
    got = {r["domain"]: r["rank"]
           for r in domain_pagerank(w, weight_col="weight").collect()}
    assert got["b"] > got["c"]
    # equivalence: weight 3 == the same edge repeated 3 times
    multi = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "b"), ("a", "c"),
         ("b", "a"), ("c", "a")], "src string, dst string")
    want = {r["domain"]: r["rank"]
            for r in domain_pagerank(multi).collect()}
    assert got == want


def test_nl_rank_report_parity_across_methods(spark, tmp_path):
    """Both arms of the domain_rank target inline top domains in the
    SAME report shape — (domain, score, in_degree) — so the two
    rankings compare from one target; the harmonic arm's in-degrees
    match the edge table."""
    from dynamic_etl_pipeline_thesis_ii_spark.plans.orchestrator import (
        FixtureFetcher,
        Pipeline,
    )

    edges_dir = str(tmp_path / "graph")
    _edges(spark, [("a.com", "hub.com"), ("b.com", "hub.com"),
                   ("c.com", "hub.com"), ("hub.com", "a.com")]) \
        .write.parquet(edges_dir)
    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "x")], "doc_id bigint, text string") \
        .write.parquet(src + "/documents.parquet")
    pipe = Pipeline(spark, FixtureFetcher(spark, src))
    r_pr = pipe.run_dataops(
        f"rank the domains by the link graph at {edges_dir}",
        src, str(tmp_path / "pr"))
    r_h = pipe.run_dataops(
        f"rank the domains by harmonic centrality using the link "
        f"graph at {edges_dir}", src, str(tmp_path / "h"))
    assert r_pr["status"] == "complete" and r_h["status"] == "complete"
    t_pr, t_h = (r["reports"]["top_domains"] for r in (r_pr, r_h))
    assert {frozenset(e) for e in t_pr} \
        == {frozenset(("domain", "score", "in_degree"))}
    assert {frozenset(e) for e in t_h} \
        == {frozenset(("domain", "score", "in_degree"))}
    # the two rankings may legitimately order differently (hub.com
    # funnels all its PageRank to a.com but is the most REACHABLE
    # node) — the parity under test is the SHAPE plus consistent
    # in-degrees, which are the true edge counts on both arms
    by_dom = {e["domain"]: e["in_degree"] for e in t_h}
    assert t_h[0]["domain"] == "hub.com"
    assert by_dom["hub.com"] == 3 and by_dom["a.com"] == 1
    assert {e["domain"]: e["in_degree"] for e in t_pr} == by_dom
