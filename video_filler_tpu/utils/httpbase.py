"""Shared HTTP handler plumbing for the dashboard and the inpaint server.

One implementation of the silent access log + the _send response helper
(utils/dashboard.py and serve.py both embed request handlers), so response
-path fixes — like surviving a client that disconnects mid-response — land
in exactly one place.
"""

from __future__ import annotations

from http.server import BaseHTTPRequestHandler


class QuietHandler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet: per-request access logs would
        pass                    # swamp the training/serving stdout

    def _send(self, code: int, ctype: str, body: bytes) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        try:
            self.wfile.write(body)
        except (BrokenPipeError, ConnectionResetError):
            pass  # client went away mid-response; nothing to salvage
