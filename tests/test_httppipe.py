"""Raw-request parser (O7) + gated xlsx sink (O9)."""

import pytest

from nightcrawlercmd_spark.sources.httppipe import parse_raw_request, write_xlsx


def test_parse_full_request():
    raw = (
        "POST /api/v1/search?q=x HTTP/1.1\r\n"
        "Host: api.example.test\r\n"
        "Content-Type: application/json\r\n"
        "\r\n"
        '{"q": "x"}'
    )
    r = parse_raw_request(raw)
    assert r.method == "POST" and r.path == "/api/v1/search?q=x"
    assert r.headers["host"] == "api.example.test"
    assert r.headers["content-type"] == "application/json"
    assert r.body == '{"q": "x"}'
    assert r.url == "http://api.example.test/api/v1/search?q=x"


def test_parse_defaults_host_and_path():
    r = parse_raw_request("GET foo HTTP/1.0\n", default_host="h.test")
    assert r.url == "http://h.test/foo" and r.version == "HTTP/1.0"


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        parse_raw_request("   \n  ")
    with pytest.raises(ValueError):
        parse_raw_request("JUSTONETOKEN\n")


def test_xlsx_sink_gated(spark, tmp_path):
    df = spark.createDataFrame([("a", 1)], "name string, n int")
    try:
        import openpyxl  # noqa: F401

        write_xlsx(df, str(tmp_path / "o.xlsx"))
        assert (tmp_path / "o.xlsx").exists()
    except ImportError:
        with pytest.raises(NotImplementedError):
            write_xlsx(df, str(tmp_path / "o.xlsx"))
