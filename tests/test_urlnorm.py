"""Canonicalizer golden cases (SURVEY.md O18; RFC 3986)."""

from nightcrawlercmd_spark.functions.urlnorm import canonicalize, host_of, resolve

GOLDEN = [
    # lowercase scheme + host
    ("HTTP://WWW.Example.COM/", "http://www.example.com/"),
    # default port dropped, non-default kept
    ("http://h.test:80/a", "http://h.test/a"),
    ("https://h.test:443/a", "https://h.test/a"),
    ("http://h.test:8080/a", "http://h.test:8080/a"),
    # dot segments
    ("http://h.test/a/b/../c/./d", "http://h.test/a/c/d"),
    ("http://h.test/../../x", "http://h.test/x"),
    # empty path
    ("http://h.test", "http://h.test/"),
    # fragment stripped
    ("http://h.test/p#frag", "http://h.test/p"),
    # query sorted, blanks kept
    ("http://h.test/p?b=2&a=1", "http://h.test/p?a=1&b=2"),
    ("http://h.test/p?x=&y=1", "http://h.test/p?x=&y=1"),
    # trailing dot host
    ("http://h.test./p", "http://h.test/p"),
    # non-http rejected
    ("ftp://h.test/x", None),
    ("mailto:a@b.c", None),
    ("javascript:void(0)", None),
    ("", None),
    ("   ", None),
    # idempotence food: percent-encoding normalization
    ("http://h.test/a%2Fb", "http://h.test/a%2Fb"),
    # reserved percent-encodings in the query survive (RFC 3986 §2.2):
    # %26/%3D/%2B must NOT collapse into & / = / + (ADVICE r1)
    ("http://h.test/p?a=b%26c%3Dd", "http://h.test/p?a=b%26c%3Dd"),
    ("http://h.test/p?x=%2B1", "http://h.test/p?x=%2B1"),
    ("http://h.test/p?x=+1", "http://h.test/p?x=+1"),
    # IPv6 literal host keeps brackets (ADVICE r1)
    ("http://[::1]:8080/p", "http://[::1]:8080/p"),
    ("HTTP://[2001:DB8::1]/x", "http://[2001:db8::1]/x"),
    # trailing "." / ".." resolve to the DIRECTORY (RFC 3986 §5.2.4,
    # like Go's net/url): keep the trailing slash
    ("http://h.test/a/b/..", "http://h.test/a/"),
    ("http://h.test/a/.", "http://h.test/a/"),
    ("http://h.test/..", "http://h.test/"),
    # userinfo is identity (RFC 3986 §3.2.1) — preserved, host still
    # lowercased, default port still dropped
    ("http://alice@H.test:80/p", "http://alice@h.test/p"),
    ("http://alice:pw@h.test:8080/p", "http://alice:pw@h.test:8080/p"),
]


def test_golden_cases():
    for raw, want in GOLDEN:
        assert canonicalize(raw) == want, raw


def test_idempotent():
    for raw, want in GOLDEN:
        if want is not None:
            assert canonicalize(want) == want


def test_resolve():
    assert resolve("http://h.test/a/b", "../p/3") == "http://h.test/p/3"
    assert resolve("http://h.test/a/b", "c") == "http://h.test/a/c"
    assert resolve("http://h.test/a/", "/root") == "http://h.test/root"
    assert resolve("http://h.test/a", "http://other.test/x") == "http://other.test/x"
    assert resolve("http://h.test/a", "") is None
    assert resolve("http://h.test/a", "#sec") is None
    assert resolve("http://h.test/a", "mailto:x@y.z") is None


def test_resolve_absolute_href_matches_seed_canonicalization():
    # An absolute href must canonicalize to the same string whether it
    # arrives as a seed (canonicalize) or as an extracted link
    # (resolve) — including the trailing-';' case where urlparse-based
    # urljoin would have silently dropped the empty path-params.
    for href in (
        "http://h.test/a;",
        "http://h.test/a;b=1",
        "HTTPS://H.test:443/x/../y?b=2&a=1#frag",
        "http://h.test",
    ):
        assert resolve("http://base.test/p", href) == canonicalize(href), href


def test_host_of():
    assert host_of("http://h.test/p") == "h.test"
    assert host_of("http://h.test:8080/p") == "h.test"
    assert host_of("http://[::1]:8080/p") == "::1"
    assert host_of("http://[2001:db8::1]/x") == "2001:db8::1"
    # userinfo stripped on the LAST '@' (raw '@' in userinfo is always
    # percent-encoded in canonical form)
    assert host_of("http://alice@h.test/p") == "h.test"
    assert host_of("http://alice:pw@h.test:8080/p") == "h.test"
    assert host_of("http://alice@[::1]:8080/p") == "::1"


def test_userinfo_distinct_identities():
    """alice@h, bob@h and bare h are three different resources — they
    must not collapse into one url_hash seen-key."""
    forms = {
        canonicalize("http://alice@h.test/p"),
        canonicalize("http://bob@h.test/p"),
        canonicalize("http://h.test/p"),
    }
    assert len(forms) == 3
    # but they are the same HOST for scope/robots/politeness purposes
    assert {host_of(u) for u in forms} == {"h.test"}


def test_reserved_query_encodings_stay_distinct():
    a = canonicalize("http://h.test/p?a=b%26c%3Dd")
    b = canonicalize("http://h.test/p?a=b&c=d")
    assert a != b
    assert canonicalize("http://h.test/p?x=%2B1") != canonicalize("http://h.test/p?x=+1")


def test_host_path_cols_match_python_twins(spark):
    """The JVM column splitters must split on the FIRST '://' like the
    Python twins — a URL embedded in a path or query (redirect
    trackers, ?to= params) must not hijack the host/path."""
    from pyspark.sql import functions as F

    from nightcrawlercmd_spark.functions.urlnorm import host_of
    from nightcrawlercmd_spark.operators.links import host_of_col, path_of_col
    from nightcrawlercmd_spark.streaming.simulator import _path_of

    urls = [
        "http://host00.w1.test/go?to=http://offsite.example/x",
        "http://host00.w1.test/redir/http://other.example/deep/page",
        "http://host01.w1.test:8080/a/b?q=1",
        "http://[::1]:8080/p?u=https://e.test/y",
        "http://host02.w1.test/plain",
        "http://alice@host03.w1.test/p",
        "http://alice:pw@host03.w1.test:8080/p?u=http://bob@e.test/z",
        "http://alice@[::1]:8080/p",
        # RAW (non-canonical) httpscan shapes: query/fragment must be
        # cut BEFORE the authority/path split (Go url.Parse order) — a
        # '/' inside the query is not the path start, and '?x=1' after
        # a pathless host is not part of the authority
        "http://h.test?next=/login",
        "http://h.test?x=1",
        "http://h.test#frag/with/slashes",
        "http://h.test:8080?y=/a",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "canon_url string")
    rows = df.select(
        "canon_url",
        host_of_col(F.col("canon_url")).alias("h"),
        path_of_col(F.col("canon_url")).alias("p"),
    ).collect()
    for r in rows:
        assert r["h"] == host_of(r["canon_url"]), r["canon_url"]
        assert r["p"] == _path_of(r["canon_url"]), r["canon_url"]


def test_host_path_cols_component_roundtrip(spark):
    """Seeded-random component round-trip: assemble raw URLs from known
    (userinfo, host, port, path, query, fragment) parts — query and
    fragment free to contain '/' and '?' — and assert the JVM
    splitters AND the Python twins recover exactly the host and path
    components (Go url.Parse semantics). One Spark job for all cases."""
    import random

    from pyspark.sql import functions as F

    from nightcrawlercmd_spark.functions.urlnorm import host_of
    from nightcrawlercmd_spark.operators.links import host_of_col, path_of_col
    from nightcrawlercmd_spark.streaming.simulator import _path_of

    rng = random.Random(0xC0FFEE)
    hostchars = "abcdefghijklmnopqrstuvwxyz0123456789-."
    qchars = "abc0189=&_%/?+"
    cases = []
    for _ in range(300):
        host = "".join(rng.choice(hostchars) for _ in range(rng.randint(1, 12)))
        if rng.random() < 0.1:
            host_disp, host_want = f"[{host.replace('.', ':')}]", host.replace(".", ":")
        else:
            host_disp = host_want = host
        user = rng.choice(["", "u@", "u:pw@", "a%40b@"])
        port = rng.choice(["", ":80", ":8080"])
        path = (
            "/" + "".join(rng.choice(hostchars + "/~") for _ in range(rng.randint(0, 10)))
            if rng.random() < 0.6
            else ""
        )
        query = (
            "?" + "".join(rng.choice(qchars) for _ in range(rng.randint(0, 12)))
            if rng.random() < 0.6
            else ""
        )
        frag = (
            "#" + "".join(rng.choice(qchars) for _ in range(rng.randint(0, 8)))
            if rng.random() < 0.4
            else ""
        )
        url = f"http://{user}{host_disp}{port}{path}{query}{frag}"
        cases.append((url, host_want, path))
    df = spark.createDataFrame(
        [(u,) for u, _, _ in cases], "canon_url string"
    ).select(
        "canon_url",
        host_of_col(F.col("canon_url")).alias("h"),
        path_of_col(F.col("canon_url")).alias("p"),
    )
    got = {r["canon_url"]: (r["h"], r["p"]) for r in df.collect()}
    for url, want_h, want_p in cases:
        assert got[url] == (want_h, want_p), url
        assert host_of(url) == want_h, url
        assert _path_of(url) == want_p, url
