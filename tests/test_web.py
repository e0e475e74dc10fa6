"""Host extraction + host-level graph collapse (functions/web.py)."""

from pyspark.sql import functions as F

from nx_neptune_spark.functions.web import host_graph, host_link_pairs, url_host


def test_url_host_forms(spark):
    rows = [
        ("https://example.com/a", "example.com"),
        ("https://www.example.com/a", "example.com"),
        ("http://user:pw@www.Sub.Example.ORG:8080/p?q#f", "sub.example.org"),
        ("ftp://files.example.net", "files.example.net"),
        ("not a url", ""),
        ("/relative/path", ""),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    got = [r["h"] for r in df.select(url_host("url").alias("h")).collect()]
    assert got == [h for _, h in rows]


def test_url_host_keep_www(spark):
    df = spark.createDataFrame([("https://www.example.com/",)], "url string")
    got = df.select(url_host("url", strip_www=False).alias("h")).first()["h"]
    assert got == "www.example.com"


def test_host_link_pairs_collapse(spark):
    named = spark.createDataFrame(
        [
            ("https://a.com/1", "https://b.com/x"),
            ("https://a.com/2", "https://b.com/y"),   # same host pair
            ("https://a.com/1", "https://a.com/2"),   # intra-host: dropped
            ("https://www.a.com/3", "https://c.com/"),  # www collapses into a.com
            ("bogus", "https://b.com/"),              # unparseable src: dropped
        ],
        "src_name string, dst_name string",
    )
    got = {
        (r["src_name"], r["dst_name"]): r["weight"]
        for r in host_link_pairs(named).collect()
    }
    assert got == {("a.com", "b.com"): 2.0, ("a.com", "c.com"): 1.0}


def test_host_graph_end_to_end(spark):
    """Pages whose html links cross two hosts -> host LinkGraph with
    weighted edges, rankable by weighted PageRank."""
    pages = spark.createDataFrame(
        [
            (
                "https://a.com/1",
                '<a href="https://b.com/x">x</a><a href="https://b.com/y">y</a>',
            ),
            ("https://a.com/2", '<a href="https://b.com/x">x</a>'),
            ("https://b.com/x", '<a href="https://a.com/1">back</a>'),
        ],
        "url string, html string",
    )
    g = host_graph(pages)
    names = {r["vid"]: r["name"] for r in g.vertices.collect()}
    edges = {
        (names[r["src"]], names[r["dst"]]): r["weight"]
        for r in g.edges.collect()
    }
    assert edges == {("a.com", "b.com"): 3.0, ("b.com", "a.com"): 1.0}

    from nx_neptune_spark.operators.pagerank import pagerank

    pr = pagerank(g, fixed_iterations=5, weight="weight")
    ranks = {names[r["vid"]]: r["rank"] for r in pr.collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
