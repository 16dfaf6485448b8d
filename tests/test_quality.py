

def test_grouped_outliers_adversarial_and_approx(spark):
    """NULL values never flag; NULL groups form a stratum; exact and
    approx agree on a well-separated fixture; row conservation holds."""
    from graphsense_ethereum_etl_spark.operators.quality import grouped_outliers

    rows = (
        [(i, "a", 10.0 + (i % 3)) for i in range(30)]
        + [(90, "a", 9000.0), (91, "a", None), (92, None, 10.0), (93, None, 9000.0)]
    )
    df = spark.createDataFrame(rows, "id bigint, g string, v double")
    for exact in (True, False):
        out = grouped_outliers(df, "v", "g", k=5.0, exact=exact)
        got = {r.id: r.is_outlier for r in out.collect()}
        assert len(got) == len(rows)          # every row returns
        assert got[90] is True                # planted extreme flags
        assert got[91] is None                # NULL value -> no verdict
        assert all(got[i] is False for i in range(30))
        # NULL group: its own stratum of {10, 9000} -> mad over 2 values
        assert got[92] is not None and got[93] is not None
