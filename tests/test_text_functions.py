

def test_canonical_url_edge_cases(spark):
    """Edge inputs: non-default port kept, https :443 dropped, empty path
    -> '/', all-utm query -> no query, NULL url -> NULL, and the
    normalization is idempotent (canon(canon(u)) == canon(u))."""
    from pyspark.sql import functions as F

    from graphsense_ethereum_etl_spark.functions.text import canonical_url

    rows = [
        (0, "HTTP://A.B:80/x?b=2&a=1#f"),
        (1, "https://h:443/"),
        (2, "https://h:8443/x?z=1&y=2"),
        (3, "http://h"),
        (4, "http://h/p?utm_a=1&utm_b=2"),
        (5, "http://h/p?"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "i bigint, url string")
    got = {
        r.i: r.c
        for r in df.select("i", canonical_url("url").alias("c")).collect()
    }
    assert got == {
        0: "http://a.b/x?a=1&b=2",
        1: "https://h/",
        2: "https://h:8443/x?y=2&z=1",
        3: "http://h/",
        4: "http://h/p",
        5: "http://h/p",
        6: None,
    }
    twice = {
        r.i: r.c2
        for r in df.select(
            "i", canonical_url(canonical_url("url")).alias("c2")
        ).collect()
    }
    assert twice == got  # idempotent
