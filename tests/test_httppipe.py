"""Raw-request parser (O7) + from-scratch xlsx sink (O9)."""

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


def test_xlsx_sink_round_trip(spark, tmp_path):
    """The stdlib SpreadsheetML writer produces a valid package: all
    five parts present, and the worksheet XML parses back to exactly
    the header + data grid (strings, ints, floats, null, and an
    XML-hostile value)."""
    import zipfile
    import xml.etree.ElementTree as ET

    df = spark.createDataFrame(
        [("found.test", 4, 0.25, "<&'\"> ok"), ("missing.test", 0, None, "x")],
        "domain string, records int, score double, note string",
    )
    path = str(tmp_path / "o.xlsx")
    write_xlsx(df, path, sheet_name="dns")
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert {
            "[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
            "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml",
        } <= names
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
        wb = z.read("xl/workbook.xml").decode()
    assert 'name="dns"' in wb
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    root = ET.fromstring(sheet)
    grid = []
    for row in root.findall(".//m:row", ns):
        vals = []
        for c in row.findall("m:c", ns):
            t = c.find("m:is/m:t", ns)
            v = c.find("m:v", ns)
            vals.append(t.text if t is not None else (v.text if v is not None else None))
        grid.append(vals)
    assert grid[0] == ["domain", "records", "score", "note"]
    assert grid[1] == ["found.test", "4", "0.25", "<&'\"> ok"]
    assert grid[2] == ["missing.test", "0", None, "x"]


def test_xlsx_nonfinite_and_decimal_cells(spark, tmp_path):
    """NaN/Inf doubles must not produce invalid <v> number cells (they
    become text); ints/Decimals stay numeric."""
    import math
    import zipfile
    import xml.etree.ElementTree as ET

    df = spark.createDataFrame(
        [(1, float("nan")), (2, float("inf")), (3, 0.5)], "k int, v double"
    )
    path = str(tmp_path / "n.xlsx")
    write_xlsx(df, path)
    with zipfile.ZipFile(path) as z:
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
    assert "<v>nan</v>" not in sheet and "<v>inf</v>" not in sheet
    root = ET.fromstring(sheet)  # still well-formed XML
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    numeric = [v.text for v in root.findall(".//m:c[m:v]/m:v", ns)]
    assert "0.5" in numeric  # finite doubles stay numeric cells


def test_pipe_request_fires_parsed_request():
    """O7 end-to-end (mainHttpPipe.go:63): parse a raw on-disk-style
    request, fire it through a real socket at the WorldHTTPServer, and
    get the same status/body the synthetic responder produces."""
    from nightcrawlercmd_spark.sources.corpus import WorldConfig, fetch_one
    from nightcrawlercmd_spark.sources.httppipe import parse_raw_request, pipe_request
    from nightcrawlercmd_spark.sources.httpserver import WorldHTTPServer

    world = WorldConfig(n_hosts=2, base_pages=4, hot_factor=2, tag="t-pipe")
    srv = WorldHTTPServer(world).start()
    try:
        vhost = f"host00.{world.tag}.test"
        raw = f"GET /p/0 HTTP/1.1\r\nHost: {vhost}\r\nX-Probe: 1\r\n\r\n"
        req = parse_raw_request(raw)
        assert req.url == f"http://{vhost}/p/0"
        got = pipe_request(req, srv.endpoint)
        want = fetch_one(world, req.url)
        assert got["status_code"] == want["status_code"]
        assert bytes(got["body"]) == bytes(want["body"])

        # a redirect comes back raw (not followed), like resp.Write
        red = None
        for j in range(4):
            w = fetch_one(world, f"http://{vhost}/p/{j}")
            if w["status_code"] in range(300, 308):
                red = (j, w)
                break
        if red is not None:
            j, w = red
            r2 = pipe_request(
                parse_raw_request(f"GET /p/{j} HTTP/1.1\r\nHost: {vhost}\r\n\r\n"),
                srv.endpoint,
            )
            assert r2["status_code"] == w["status_code"]
            assert r2["headers"].get("location") == w["location"]
    finally:
        srv.stop()


def test_xlsx_decimal_nonfinite_cells(tmp_path):
    """Decimal('NaN')/Decimal('Infinity') must become text cells like
    their float counterparts — the numeric branch emitted <v>NaN</v>,
    which is not a valid SpreadsheetML number lexical form."""
    import decimal
    import zipfile
    import xml.etree.ElementTree as ET

    class _Rows:  # duck-typed: Spark decimals can't hold NaN, but the
        columns = ["k", "v"]  # sink is also used on plain collected rows

        @staticmethod
        def collect():
            return [
                {"k": 1, "v": decimal.Decimal("NaN")},
                {"k": 2, "v": decimal.Decimal("Infinity")},
                {"k": 3, "v": decimal.Decimal("1.25")},
            ]

    path = str(tmp_path / "d.xlsx")
    write_xlsx(_Rows, path)
    with zipfile.ZipFile(path) as z:
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
    assert "<v>NaN</v>" not in sheet and "<v>Infinity</v>" not in sheet
    root = ET.fromstring(sheet)
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    numeric = [v.text for v in root.findall(".//m:c[m:v]/m:v", ns)]
    assert "1.25" in numeric  # finite Decimals stay numeric cells
