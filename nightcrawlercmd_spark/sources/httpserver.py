"""Static HTTP file server (SURVEY.md O13) + real-fetch integration.

The reference ships a tiny static file server used as a crawl fixture
(/root/reference/mainHttpServer.go:12-23: http.FileServer on a dir).
This is the engine's analog: a threaded HTTP server that serves the
deterministic synthetic world over REAL sockets — page bodies, 301
redirects, 404s, and the image payloads at ``/img/<image_id>.png`` —
so the fetch stage can be driven through an actual HTTP client
(``operators/fetch.fetch_stage(http_endpoint=...)``) and verified
against the same sequential oracle. In a deployment the endpoint is
the open internet; the Spark plumbing (batching, partitioning, schema)
is identical, which is exactly what this fixture proves.

Virtual-hosting: requests arrive at 127.0.0.1:port with the original
host in the ``Host`` header (the standard way to serve many sites from
one listener), so one server is the whole multi-host world.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .corpus import WorldConfig, _image_ids, _known_hosts, fetch_one, gen_image
from ..functions.codecs_np import encode


class WorldHTTPServer:
    """Serve a WorldConfig's universe over HTTP; start()/stop()."""

    def __init__(self, world: WorldConfig, host: str = "127.0.0.1", port: int = 0):
        self.world = world
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # silence per-request stderr spam
                pass

            def do_GET(self):
                vhost = (self.headers.get("Host") or "").split(":")[0]
                # payload channel: fetch_image addresses the server by
                # its bind address (a CDN-style direct request); crawl
                # fetches of /img URLs carry a world vhost and must
                # answer exactly like the synthetic fetch_one — an
                # unconditional intercept served 200s that the
                # sequential oracle logged as 404/DNS-fail, breaking
                # load_resources parity. Unknown image ids 404.
                if (
                    self.path.startswith("/img/")
                    and self.path.endswith(".png")
                    and (
                        vhost == self.server.server_address[0]
                        or vhost in _known_hosts(outer.world)
                    )
                ):
                    image_id = self.path[len("/img/"):-len(".png")]
                    if image_id not in _image_ids(outer.world):
                        if vhost not in _known_hosts(outer.world):
                            # payload-channel miss (bind-address vhost):
                            # a plain 404, there is no world page to ask
                            self.send_response(404)
                            self.send_header("Content-Length", "0")
                            self.end_headers()
                            return
                        # crawl-fetch miss: serve fetch_one's 404 page
                        # so real and synthetic bodies stay identical
                        return self._serve_page(vhost)
                    img, w, h, fmt = gen_image(outer.world, image_id)
                    blob = encode(img, fmt)
                    self.send_response(200)
                    self.send_header("Content-Type", "application/octet-stream")
                    self.send_header("X-Img-Fmt", fmt)
                    self.send_header("X-Img-W", str(w))
                    self.send_header("X-Img-H", str(h))
                    self.send_header("Content-Length", str(len(blob)))
                    self.end_headers()
                    self.wfile.write(blob)
                    return
                self._serve_page(vhost)

            def _serve_page(self, vhost):
                page = fetch_one(outer.world, f"http://{vhost}{self.path}")
                status = page["status_code"] or 502  # 0 = synthetic DNS fail
                body = page["body"] or b""
                self.send_response(status)
                if page["location"]:
                    self.send_header("Location", page["location"])
                if page["status_code"] == 0 and page["error"]:
                    # a real client surfaces resolver failures as
                    # exceptions, not responses; the virtual-hosted
                    # fixture can only answer over the socket, so it
                    # marks the row and HttpFetcher translates it back
                    # to (status 0, error) for oracle parity
                    self.send_header("X-Synthetic-Error", page["error"])
                self.send_header("Content-Type", page["content_type"])
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._srv = ThreadingHTTPServer((host, port), Handler)
        self._srv.daemon_threads = True
        self._thread: threading.Thread | None = None

    @property
    def endpoint(self) -> str:
        h, p = self._srv.server_address[:2]
        return f"{h}:{p}"

    def start(self) -> "WorldHTTPServer":
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()
        if self._thread:
            self._thread.join(timeout=5)
