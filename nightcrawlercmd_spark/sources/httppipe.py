"""Raw HTTP request parsing, firing, and the XLSX sink (SURVEY.md O7, O9).

The reference's `curl` subcommand reads an on-disk raw HTTP request,
defaults scheme/host, and fires it (mainHttpPipe.go:81-100, :63
``http.DefaultClient.Do``). Parsing is driver-side config work, not a
dataflow — but the parsed request seeds probe pipelines (httpscan), so
the parser lives here, and ``pipe_request`` fires a parsed request
against a real endpoint (the O13 WorldHTTPServer in tests).

O9 (DNS results → Excel, mainDNS.go:121-138): ``write_xlsx`` is a
from-scratch SpreadsheetML writer (stdlib zip + XML, ECMA-376 subset) —
no third-party xlsx library needed.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class RawRequest:
    method: str
    path: str
    version: str
    headers: dict[str, str] = field(default_factory=dict)
    body: str = ""

    @property
    def url(self) -> str:
        host = self.headers.get("host", "localhost")
        scheme = "https" if self.headers.get("x-scheme") == "https" else "http"
        return f"{scheme}://{host}{self.path}"


def parse_raw_request(text: str, default_host: str = "localhost") -> RawRequest:
    """Parse a raw HTTP/1.x request (the shape http.ReadRequest accepts:
    request line, headers, blank line, optional body)."""
    head, _, body = text.replace("\r\n", "\n").partition("\n\n")
    lines = [ln for ln in head.split("\n") if ln.strip()]
    if not lines:
        raise ValueError("empty request")
    parts = lines[0].split()
    if len(parts) < 2:
        raise ValueError(f"bad request line: {lines[0]!r}")
    method, path = parts[0].upper(), parts[1]
    version = parts[2] if len(parts) > 2 else "HTTP/1.1"
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        if _:
            headers[k.strip().lower()] = v.strip()
    headers.setdefault("host", default_host)
    if not path.startswith("/"):
        path = "/" + path
    return RawRequest(method=method, path=path, version=version, headers=headers, body=body)


def pipe_request(
    req: RawRequest, endpoint: str, timeout: float = 30.0, scheme: str = "http"
) -> dict:
    """Fire a parsed raw request at a real endpoint (reference
    mainHttpPipe.go:63: the read request goes straight to
    ``http.DefaultClient.Do``). ``endpoint`` is ``host:port`` of the
    actual socket (e.g. a WorldHTTPServer); the request's Host header
    does the virtual-host routing, like the reference's
    ``req.URL.Host = req.Host`` default (mainHttpPipe.go:91-99).
    ``scheme`` mirrors the reference ``-scheme`` flag
    (mainHttpPipe.go:50-52): ``https`` opens a TLS connection with
    verification off, like the reference's global
    ``InsecureSkipVerify`` transport. Returns {status_code, headers,
    body, url}. Redirects are NOT followed — the raw response comes
    back, matching ``resp.Write``."""
    import http.client

    host, port = endpoint.rsplit(":", 1)
    if scheme == "https":
        import ssl

        conn = http.client.HTTPSConnection(
            host, int(port), timeout=timeout,
            context=ssl._create_unverified_context(),
        )
    else:
        conn = http.client.HTTPConnection(host, int(port), timeout=timeout)
    try:
        headers = dict(req.headers)
        body = req.body.encode() if req.body else None
        # ALWAYS recompute content-length: parse_raw_request normalizes
        # CRLF→LF in the body, so a preserved original header can
        # overstate the length — the server would block waiting for
        # bytes that never come (then time out or 400)
        if body is not None:
            headers["content-length"] = str(len(body))
        else:
            headers.pop("content-length", None)
        conn.request(req.method, req.path, body=body, headers=headers)
        resp = conn.getresponse()
        return {
            "status_code": resp.status,
            "headers": {k.lower(): v for k, v in resp.getheaders()},
            "body": resp.read(),
            "url": req.url,
        }
    finally:
        conn.close()


def _col_letter(i: int) -> str:
    """0-based column index → A, B, …, Z, AA, …"""
    s = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        s = chr(ord("A") + rem) + s
    return s


_XLSX_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)
_XLSX_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_XLSX_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def write_xlsx(df, path: str, sheet_name: str = "Report") -> None:
    """DNS-report Excel sink (O9; reference /root/reference/mainDNS.go:122-143
    via tealeg/xlsx). Implemented from scratch against the public
    ECMA-376 SpreadsheetML package layout — a zip of five XML parts
    with inline-string cells — so no external xlsx library is needed.

    Reports are small by construction (wordlist × domain grids), so a
    driver-side collect matches the reference's in-memory workbook;
    at data scale you'd use the sharded CSV sink instead (xlsx is
    inherently a single file)."""
    import decimal
    import math
    import re as _re
    import zipfile
    from xml.sax.saxutils import escape as _sax_escape

    # XML 1.0 forbids most C0 controls even escaped; strip them or the
    # whole workbook is rejected by Excel/openpyxl
    _XML_BAD = _re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")

    def escape(s: str) -> str:
        return _sax_escape(_XML_BAD.sub("", s))

    def escape_attr(s: str) -> str:
        # attribute context additionally needs the quote escaped —
        # saxutils.escape alone leaves '"' intact and a sheet name
        # like 'DNS "prod"' would emit malformed XML
        return _sax_escape(_XML_BAD.sub("", s), {'"': "&quot;"})

    header = list(df.columns)
    # driver-side render, like the reference's dnsReportExcel: the
    # input is a DNS-report-sized result (one row per scanned name),
    # not a data-scale table — a 100-TB pipeline never routes bulk
    # rows through a spreadsheet sink
    rows = [header] + [[row[c] for c in header] for row in df.collect()]

    def cell(r: int, c: int, v) -> str:
        ref = f"{_col_letter(c)}{r + 1}"
        if v is None:
            return f'<c r="{ref}"/>'
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, float):
            # NaN/±Inf are not valid SpreadsheetML number lexical forms
            # — emit them as text rather than a corrupt <v>
            if not math.isfinite(v):
                return (
                    f'<c r="{ref}" t="inlineStr"><is><t>{escape(repr(v))}</t>'
                    "</is></c>"
                )
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        if isinstance(v, (int, decimal.Decimal)):
            # Decimal('NaN')/Decimal('Infinity') would emit the same
            # invalid <v> lexical form the float branch guards against
            if isinstance(v, decimal.Decimal) and not v.is_finite():
                return (
                    f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(v))}</t>'
                    "</is></c>"
                )
            return f'<c r="{ref}"><v>{v}</v></c>'
        # everything else (strings, timestamps, binary reprs) → text
        return (
            f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
            f"{escape(str(v))}</t></is></c>"
        )

    body = "".join(
        f'<row r="{ri + 1}">' + "".join(cell(ri, ci, v) for ci, v in enumerate(row)) + "</row>"
        for ri, row in enumerate(rows)
    )
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{body}</sheetData></worksheet>"
    )
    workbook_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape_attr(sheet_name)}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _XLSX_CONTENT_TYPES)
        z.writestr("_rels/.rels", _XLSX_ROOT_RELS)
        z.writestr("xl/workbook.xml", workbook_xml)
        z.writestr("xl/_rels/workbook.xml.rels", _XLSX_WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)
