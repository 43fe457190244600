"""Live HTTP wire path for the scraper transport (r4 verdict #5).

The delivery semantics around fetching (cursor advance, landing,
retry) are covered by injection elsewhere; this suite drives
`http_login` / `http_fetch_spots` against a loopback stdlib
http.server speaking the wsprnet API shapes (wsprnet-scraper.sh:
169-188 login, :230-233 spot fetch) — the real POST bodies, headers,
cookie round-trip, and error path. Both transports are exercised:
`requests` when installed, and the stdlib urllib fallback (forced by
poisoning sys.modules) so the no-dependency path stays proven even in
environments that have requests.
"""

from __future__ import annotations

import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from wsprnet_scraper_spark.streaming.fetcher import (
    Cursor,
    fetch_once,
    http_fetch_spots,
    http_login,
)


class _ApiHandler(BaseHTTPRequestHandler):
    """Minimal wsprnet-API double: /login issues a session, /spots
    requires its cookie and pages spots after spotnum_start."""

    SPOTS = [{"Spotnum": n, "Reporter": f"R{n % 3}"} for n in range(1, 21)]
    seen: list[dict] = []  # (path, body, cookie) per request

    def do_POST(self):  # noqa: N802 - http.server API
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"]))
        )
        cookie = self.headers.get("Cookie")
        type(self).seen.append(
            {"path": self.path, "body": body, "cookie": cookie}
        )
        if self.path == "/drupal/rest/user/login":
            if body.get("pass") != "hunter2":
                self.send_response(403)
                self.end_headers()
                return
            out = {"session_name": "SESSdeadbeef", "sessid": "tok123"}
        elif self.path == "/drupal/wsprnet/spots/json":
            if cookie != "SESSdeadbeef=tok123":
                self.send_response(403)
                self.end_headers()
                return
            start = body["spotnum_start"]
            out = [s for s in self.SPOTS if s["Spotnum"] > start][:7]
        else:
            self.send_response(404)
            self.end_headers()
            return
        payload = json.dumps(out).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # silence test output
        pass


@pytest.fixture(params=["native", "urllib"])
def api_server(request, monkeypatch):
    """Loopback API double; param 'urllib' poisons `import requests`
    so _http_post_json exercises the stdlib fallback."""
    if request.param == "urllib":
        monkeypatch.setitem(sys.modules, "requests", None)
    _ApiHandler.seen = []
    srv = HTTPServer(("127.0.0.1", 0), _ApiHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}"
    finally:
        srv.shutdown()
        t.join(timeout=5)


def test_login_fetch_cookie_roundtrip(api_server):
    cookie = http_login(
        f"{api_server}/drupal/rest/user/login", "wd_user", "hunter2"
    )
    assert cookie == "SESSdeadbeef=tok123"
    spots = http_fetch_spots(
        f"{api_server}/drupal/wsprnet/spots/json", cookie, spotnum_start=3
    )
    assert [s["Spotnum"] for s in spots] == [4, 5, 6, 7, 8, 9, 10]
    # the wire bodies match the reference's curl payloads
    login_req, fetch_req = _ApiHandler.seen
    assert login_req["body"] == {"name": "wd_user", "pass": "hunter2"}
    assert fetch_req["cookie"] == cookie
    assert fetch_req["body"]["exclude_special"] == 1
    assert fetch_req["body"]["band"] == "All"


def test_http_error_propagates_not_swallowed(api_server):
    # urllib raises urllib.error.HTTPError, requests raises
    # requests.exceptions.HTTPError — both carry the 403
    with pytest.raises(Exception, match="403"):
        http_login(
            f"{api_server}/drupal/rest/user/login", "wd_user", "wrong"
        )
    with pytest.raises(Exception, match="403"):
        http_fetch_spots(
            f"{api_server}/drupal/wsprnet/spots/json", "bad=cookie", 0
        )


def test_fetch_once_over_live_transport(api_server, tmp_path):
    """The full poll tick with the REAL fetch_fn (not an injected
    generator): login, fetch after the durable cursor, land, advance —
    then a second tick resumes exactly where the first left off."""
    cookie = http_login(
        f"{api_server}/drupal/rest/user/login", "wd_user", "hunter2"
    )
    url = f"{api_server}/drupal/wsprnet/spots/json"
    cursor = Cursor(tmp_path / "cursor.json")
    landing = tmp_path / "landing"

    fetch = lambda start: http_fetch_spots(url, cookie, start)  # noqa: E731
    assert fetch_once(fetch, cursor, landing) == 7
    assert cursor.read() == 7
    assert fetch_once(fetch, cursor, landing) == 7
    assert cursor.read() == 14
    landed = sorted(landing.glob("spots-*.json"))
    assert len(landed) == 2
    nums = [
        json.loads(line)["Spotnum"]
        for f in landed
        for line in f.read_text().splitlines()
    ]
    assert sorted(nums) == list(range(1, 15))
