"""Prometheus metrics endpoint (SURVEY §2.8 K5).

The reference serves promhttp on ``MetricsListen`` for its two
counters (main.go:181-187, 41-47). Spark publishes its own engine
metrics through the built-in PrometheusServlet
(``spark.ui.prometheus.enabled``), but the reference's APPLICATION
counters (documents sent / errors) live in ``StreamMetrics`` on the
driver — this module serves them in exposition format from a stdlib
HTTP server, no extra dependencies.

Driver-side is the right place at any scale: the counters are
aggregated in ``foreachBatch`` on the driver (executor work is already
summed by the time they're bumped), so the endpoint never touches
executors and costs one tiny text response per scrape.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

__all__ = ["MetricsServer"]


class MetricsServer:
    """Serve ``/metrics`` for a ``StreamMetrics`` instance.

    ``listen`` follows the reference's METRICS_LISTEN shape
    (``[host]:port``, main.go:551); port 0 binds an ephemeral port
    (tests). The server runs on a daemon thread; ``stop()`` shuts it
    down (also called by ``__del__`` as a net).
    """

    def __init__(self, metrics, listen: str = ":8080"):
        host, _, port = listen.rpartition(":")
        self._metrics = metrics
        self._host = host or "0.0.0.0"
        self._want_port = int(port or 0)
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def start(self) -> "MetricsServer":
        metrics = self._metrics

        class _Handler(BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802 - stdlib contract
                if self.path.split("?", 1)[0] != "/metrics":
                    self.send_error(404)
                    return
                body = metrics.prometheus_text().encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4; charset=utf-8"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a) -> None:  # quiet
                pass

        self._httpd = ThreadingHTTPServer(
            (self._host, self._want_port), _Handler
        )
        self._thread = threading.Thread(
            target=self._httpd.serve_forever,
            name="metrics-http",
            daemon=True,
        )
        self._thread.start()
        return self

    @property
    def port(self) -> int:
        if self._httpd is None:
            raise RuntimeError("metrics server not started")
        return self._httpd.server_address[1]

    @property
    def url(self) -> str:
        host = "127.0.0.1" if self._host in ("", "0.0.0.0") else self._host
        return f"http://{host}:{self.port}/metrics"

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

    def __del__(self) -> None:  # pragma: no cover - GC net
        try:
            self.stop()
        except Exception:
            pass
