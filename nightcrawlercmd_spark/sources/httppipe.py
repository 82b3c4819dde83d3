"""Raw HTTP request parsing + optional XLSX sink (SURVEY.md O7, O9).

The reference's `curl` subcommand reads an on-disk raw HTTP request,
defaults scheme/host, and fires it (mainHttpPipe.go:81-100). Parsing is
driver-side config work, not a dataflow — but the parsed request seeds
probe pipelines (httpscan), so the parser lives here with tests.

O9 (DNS results → Excel, mainDNS.go:121-138) is gated behind an
import-try: no xlsx library ships in this sandbox, so the function
raises a clear NotImplementedError unless openpyxl/xlsxwriter appears.
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


def write_xlsx(df, path: str) -> None:
    """DNS-report Excel sink (O9) — gated: raises unless an xlsx
    writer library is installed (none ships in this sandbox)."""
    try:
        import openpyxl  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "xlsx sink needs openpyxl/xlsxwriter (not available offline); "
            "use the CSV sink (plans/reports.run_report_suite) instead"
        ) from exc
    df.toPandas().to_excel(path, index=False)
