"""HTTP ingestion/extraction surface (S4) — the reference's API server
re-expressed for the Spark engine.

The reference serves ``POST /api/v1/vision/extract`` (+ ``/invoice``,
``/tables``, ``GET /health``) from Bun
(`pdf-processor/src/api/server.ts:60-86`, `api/handlers.ts:23-79`).
Here the same surface is a stdlib ``http.server`` wrapper with two
roles:

- **synchronous single-document extraction** (``/api/v1/extract`` and
  the profile shortcuts): body = raw document bytes, response = the
  kernel's result JSON. Runs the SAME ``extract_document`` kernel the
  Spark stage maps — no Spark session needed for one document, exactly
  like the reference's per-request path. Upload cap parity: 50 MB →
  413 (`api/validation.ts:57-58`).
- **corpus ingestion** (``/api/v1/ingest?url=…``): append the payload
  as a row of the pages table via pyarrow (no Spark session in the
  request path); the batch/streaming engines pick new files up on
  their next run (`streaming.run_extraction_stream`'s availableNow
  catch-up). This is how an upload endpoint feeds a 100 TB pipeline:
  writes land in the table, extraction stays batched and distributed —
  the request path never blocks on cluster work.

Deliberately stdlib-only (no flask/fastapi in this sandbox); the
threading server handles concurrent uploads.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .kernels.extract import MAX_DOC_BYTES, PROFILES, extract_document

_PROFILE_ROUTES = {
    "/api/v1/extract": None,          # profile from ?profile=, default auto
    "/api/v1/invoice": "invoice",
    "/api/v1/receipt": "receipt",
    "/api/v1/tables": "tables",
}


def _write_page_row(pages_dir: str, url: str, payload: bytes,
                    ts: _dt.datetime | None = None) -> str:
    """Append one row to the pages table as its own parquet part file
    (atomic rename; safe under the threading server).

    ``warc_ts`` is the ingest wall-clock (UTC) unless the caller
    supplies one: a fixed epoch placeholder would make every ingested
    row maximally late for watermarked consumers of the pages table
    (``run_dedup_stream`` watermarks warc_ts with a 2h delay —
    epoch-stamped rows would be silently dropped once any real
    timestamp advanced the watermark)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(pages_dir, exist_ok=True)
    if ts is None:
        ts = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    table = pa.table({
        "url": [url],
        "warc_ts": pa.array([ts], type=pa.timestamp("us")),
        "html": pa.array([payload], type=pa.binary()),
        "text": [""],
        "lang": [""],
    })
    name = f"upload-{uuid.uuid4().hex}.parquet"
    tmp = os.path.join(pages_dir, "." + name + ".tmp")
    pq.write_table(table, tmp)
    final = os.path.join(pages_dir, name)
    os.replace(tmp, final)
    return final


def _parse_multipart(body: bytes,
                     content_type: str) -> dict[str, tuple[str | None,
                                                           bytes]]:
    """Parse a multipart/form-data body → {field: (filename, bytes)}.

    Mirrors the reference's form-upload surface
    (`pdf-processor/src/api/handlers.ts:23-56`: file under the
    ``file`` field plus string option fields like ``debug``). Stdlib
    ``email`` is a full MIME parser; prefixing the headers makes the
    raw HTTP body a parseable message."""
    import email.parser
    import email.policy
    head = (f"Content-Type: {content_type}\r\n"
            "MIME-Version: 1.0\r\n\r\n").encode("ascii")
    msg = email.parser.BytesParser(
        policy=email.policy.default).parsebytes(head + body)
    if not msg.is_multipart():
        raise ValueError("body is not multipart/form-data")
    out: dict[str, tuple[str | None, bytes]] = {}
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        if name is None:
            continue
        out[str(name)] = (part.get_filename(),
                          part.get_payload(decode=True) or b"")
    return out


class _Handler(BaseHTTPRequestHandler):
    pages_dir: str = ""

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _reply(self, code: int, obj: dict,
               pretty: bool = False) -> None:
        # debug pretty-print parity: handlers.ts:73-76 serializes with
        # indent 2 when the request carries debug=true
        body = json.dumps(obj,
                          indent=2 if pretty else None).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if urlparse(self.path).path == "/health":
            self._reply(200, {
                "status": "ok",
                "service": "extract-kit-spark",
                "features": ["deterministic-extraction",
                             "profile-schemas", "corpus-ingest"],
                "profiles": list(PROFILES),
            })
        else:
            self._reply(404, {"success": False, "error": "not found"})

    def _read_body(self) -> bytes | None:
        length = int(self.headers.get("Content-Length") or 0)
        if length > MAX_DOC_BYTES:
            self._reply(413, {
                "success": False,
                "error": f"payload {length}B > {MAX_DOC_BYTES}B cap"})
            return None
        if length <= 0:
            self._reply(400, {"success": False,
                              "error": "empty body"})
            return None
        return self.rfile.read(length)

    def do_POST(self):
        parsed = urlparse(self.path)
        qs = parse_qs(parsed.query)
        if parsed.path in _PROFILE_ROUTES:
            payload = self._read_body()
            if payload is None:
                return
            ctype = self.headers.get("Content-Type", "")
            fields: dict[str, str] = {}
            filename = None
            if ctype.lower().startswith("multipart/form-data"):
                try:
                    form = _parse_multipart(payload, ctype)
                except Exception as exc:
                    self._reply(400, {
                        "success": False,
                        "error": f"bad multipart body: {exc}"})
                    return
                if "file" not in form:
                    self._reply(400, {
                        "success": False,
                        "error": "missing multipart field 'file'"})
                    return
                filename, payload = form.pop("file")
                fields = {k: v[1].decode("utf-8", "replace")
                          for k, v in form.items()}
                if len(payload) > MAX_DOC_BYTES:
                    self._reply(413, {
                        "success": False,
                        "error": f"payload {len(payload)}B > "
                                 f"{MAX_DOC_BYTES}B cap"})
                    return
                if not payload:
                    self._reply(400, {"success": False,
                                      "error": "empty file field"})
                    return
            profile = (_PROFILE_ROUTES[parsed.path]
                       or fields.get("profile")
                       or qs.get("profile", ["auto"])[0])
            if profile not in PROFILES:
                self._reply(400, {
                    "success": False,
                    "error": f"invalid profile {profile!r}; "
                             f"one of {sorted(PROFILES)}"})
                return
            default_url = ("upload://" + filename) if filename else \
                ("upload://" + uuid.uuid4().hex)
            url = fields.get("url") or qs.get("url", [default_url])[0]
            debug = (fields.get("debug") == "true"
                     or qs.get("debug", [""])[0] == "true")
            result = extract_document(url, payload, profile=profile)
            self._reply(200, {
                "success": result["validation"]["success"], **result},
                pretty=debug)
        elif parsed.path == "/api/v1/ingest":
            if not self.pages_dir:
                self._reply(503, {"success": False,
                                  "error": "no pages_dir configured"})
                return
            payload = self._read_body()
            if payload is None:
                return
            url = qs.get("url", [""])[0]
            if not url:
                self._reply(400, {"success": False,
                                  "error": "missing ?url="})
                return
            ts = None
            ts_raw = qs.get("ts", [""])[0]
            if ts_raw:
                try:
                    ts = _dt.datetime.fromisoformat(ts_raw)
                    if ts.tzinfo is not None:
                        ts = ts.astimezone(
                            _dt.timezone.utc).replace(tzinfo=None)
                except ValueError:
                    self._reply(400, {
                        "success": False,
                        "error": f"bad ?ts= (want ISO-8601): {ts_raw!r}"})
                    return
            part = _write_page_row(self.pages_dir, url, payload, ts=ts)
            self._reply(202, {"success": True, "queued": True,
                              "part_file": os.path.basename(part)})
        else:
            self._reply(404, {"success": False, "error": "not found"})


def make_server(pages_dir: str | None = None, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """Build (unstarted) server; port=0 picks a free port
    (server.server_address[1])."""
    handler = type("Handler", (_Handler,),
                   {"pages_dir": pages_dir or ""})
    return ThreadingHTTPServer((host, port), handler)


def serve_background(pages_dir: str | None = None,
                     host: str = "127.0.0.1",
                     port: int = 0) -> tuple[ThreadingHTTPServer,
                                             threading.Thread]:
    """Start the server on a daemon thread (tests and embedded use).
    Returns (server, thread); stop with server.shutdown()."""
    srv = make_server(pages_dir, host, port)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, t


def main() -> None:  # pragma: no cover - thin CLI
    import argparse
    ap = argparse.ArgumentParser(
        description="extract-kit-spark HTTP API")
    ap.add_argument("--pages-dir", default=None,
                    help="pages table dir for /api/v1/ingest appends")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8321)
    args = ap.parse_args()
    srv = make_server(args.pages_dir, args.host, args.port)
    print(json.dumps({"serving": True, "host": args.host,
                      "port": srv.server_address[1],
                      "pages_dir": args.pages_dir}), flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
