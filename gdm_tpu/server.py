"""HTTP pose service over AOT serving artifacts (gdm_tpu.serve).

The reference has no serving daemon at all — deployment is "re-run
`train_lm.py -state=eval` over a dataset directory" (train_lm.py:318-380).
This module turns the exported jax.export artifacts into a long-running
pose service: load once, answer POST requests forever, one process per
chip.  Python-stdlib only (http.server + numpy), so a serving host needs
nothing beyond jax + numpy — matching the artifact loader's dependency
contract (gdm_tpu/serve.py).

Wire protocol (npz over HTTP — dense uint8/float arrays, so npz beats
any JSON encoding and needs no extra deps):

  POST /pose[?obj=NAME]   body: ``np.savez`` of the raw loader arrays
                          (keys/shapes/dtypes in ``GET /meta`` →
                          ``raw_spec``; batch may be <= artifact batch,
                          short batches are padded server-side).
                          response: npz with ``poses`` [b, 3, 4]
                          (world->cam R|t, metres) and ``compute_ms``.
  GET  /healthz           {"ok": true, "objects": [...], ...}
  GET  /meta[?obj=NAME]   the artifact's meta.json.

Objects are routed by the ``obj`` query parameter (the artifact's
``obj_name`` metadata); with a single loaded artifact it may be omitted.
Device calls are serialized under one lock — TPU programs execute
in-order anyway, and the staged finalize/infer programs already
pipeline inside one call chain; concurrent HTTP readers only overlap
their (host-side) decode/encode work.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlsplit

import numpy as np


class RequestError(ValueError):
    """Client error -> HTTP status `code`."""

    def __init__(self, code: int, message: str):
        super().__init__(message)
        self.code = code


class PoseService:
    """Routes requests to loaded artifacts; pads short batches.

    Args:
      artifacts: obj_name -> gdm_tpu.serve.ServingArtifact (or any object
        with ``meta`` and ``run(raw) -> poses``).
    """

    def __init__(self, artifacts: dict):
        if not artifacts:
            raise ValueError("no artifacts")
        self.artifacts = dict(artifacts)
        self._lock = threading.Lock()
        # request-body sanity cap: a full-batch uncompressed npz of the
        # largest artifact, x4 headroom (npz framing, client padding) —
        # bounds the allocation a hostile Content-Length can force
        self.max_body_bytes = 4 * max(
            sum(int(np.prod(shape)) * np.dtype(dtype).itemsize
                for shape, dtype in a.meta["raw_spec"].values())
            for a in self.artifacts.values())

    def resolve(self, obj: str | None):
        if obj is None:
            if len(self.artifacts) == 1:
                return next(iter(self.artifacts.values()))
            raise RequestError(
                400, f"multiple objects loaded, pass ?obj= one of "
                     f"{sorted(self.artifacts)}")
        try:
            return self.artifacts[obj]
        except KeyError:
            raise RequestError(
                404, f"unknown object {obj!r}; have {sorted(self.artifacts)}")

    def run(self, obj: str | None, raw: dict):
        """Validate against the artifact's raw_spec, pad the batch to the
        compiled size (repeating the last sample — every padded row is a
        valid frame, unlike zero fill which would NaN the backprojection),
        execute, and slice the response back to the request batch."""
        art = self.resolve(obj)
        spec = art.meta["raw_spec"]
        missing = sorted(set(spec) - set(raw))
        extra = sorted(set(raw) - set(spec))
        if missing or extra:
            raise RequestError(
                400, f"raw arrays mismatch: missing {missing}, "
                     f"unexpected {extra} (see GET /meta raw_spec)")
        cap = int(spec[next(iter(spec))][0][0])
        b = None
        fed = {}
        for k in sorted(spec):
            shape, dtype = spec[k]
            a = np.asarray(raw[k])
            if str(a.dtype) != dtype:
                raise RequestError(
                    400, f"{k}: dtype {a.dtype}, artifact wants {dtype}")
            if a.ndim != len(shape) or list(a.shape[1:]) != shape[1:]:
                raise RequestError(
                    400, f"{k}: shape {list(a.shape)}, artifact wants "
                         f"[<= {shape[0]}, {', '.join(map(str, shape[1:]))}]")
            if b is None:
                b = a.shape[0]
            elif a.shape[0] != b:
                raise RequestError(400, f"{k}: batch {a.shape[0]} != {b}")
            fed[k] = a
        if b == 0 or b > cap:
            raise RequestError(
                400, f"batch {b} outside [1, {cap}] (artifact batch {cap};"
                     " split larger requests client-side)")
        if b < cap:
            fed = {k: np.concatenate(
                [a, np.repeat(a[-1:], cap - b, axis=0)]) for k, a in
                fed.items()}
        with self._lock:
            t0 = time.perf_counter()
            poses = np.asarray(art.run(fed))
            ms = (time.perf_counter() - t0) * 1e3
        return poses[:b], ms

    def warmup(self):
        """One synthetic batch per artifact so the first real request
        doesn't pay the deserialized-program compile."""
        for name, art in sorted(self.artifacts.items()):
            self.run(name, synthetic_raw(art.meta))


def load_artifact_tree(paths) -> dict:
    """obj_name -> ServingArtifact for each path in `paths`.

    A path is either an artifact directory (contains meta.json) or a
    root whose immediate subdirectories are artifacts (the
    ``serving/<dataset>/`` layout `cli export-serving` writes).  Route
    names come from the artifact's ``obj_name`` metadata, falling back
    to the directory basename; duplicates are an error."""
    import os
    import os.path as osp

    from gdm_tpu.serve import load_artifact

    artifacts = {}
    for path in paths:
        if osp.exists(osp.join(path, "meta.json")):
            dirs = [path]
        else:
            dirs = sorted(
                osp.join(path, d) for d in os.listdir(path)
                if osp.exists(osp.join(path, d, "meta.json")))
            if not dirs:
                raise ValueError(f"{path}: no artifact (meta.json) found"
                                 " in it or its subdirectories")
        for d in dirs:
            art = load_artifact(d)
            name = art.meta.get("obj_name") or osp.basename(
                osp.normpath(d))
            if name in artifacts:
                raise ValueError(f"duplicate object name {name!r} "
                                 f"({d} vs an earlier artifact)")
            artifacts[name] = art
    return artifacts


def synthetic_raw(meta: dict) -> dict:
    """A valid zero-information batch for an artifact's raw_spec —
    the SAME fill definition `cli export-serving` traces against
    (gdm_tpu.serve.synthetic_raw), so a loader-contract change cannot
    desynchronise the warmup batch from the exported program."""
    from gdm_tpu.serve import synthetic_raw as _fill

    return _fill(meta["raw_spec"])


def encode_arrays(arrays: dict) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def decode_arrays(body: bytes) -> dict:
    with np.load(io.BytesIO(body), allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


class _Handler(BaseHTTPRequestHandler):
    # set by make_server
    service: PoseService = None
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # route through logging, not stderr
        from gdm_tpu.utils.logging import get_logger

        get_logger("serve").info("%s " + fmt, self.client_address[0], *args)

    def _reply(self, code: int, body: bytes, ctype: str):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        if self.close_connection:   # early exits that left a body unread
            self.send_header("Connection", "close")
        self.end_headers()
        self.wfile.write(body)

    def _reply_json(self, code: int, obj):
        self._reply(code, json.dumps(obj).encode(), "application/json")

    def _obj(self):
        q = parse_qs(urlsplit(self.path).query)
        return q["obj"][0] if "obj" in q else None

    def do_GET(self):
        path = urlsplit(self.path).path
        try:
            if path == "/healthz":
                arts = self.service.artifacts
                self._reply_json(200, {
                    "ok": True,
                    "objects": sorted(arts),
                    "platforms": {n: list(a.platforms)
                                  for n, a in arts.items()},
                })
            elif path == "/meta":
                art = self.service.resolve(self._obj())
                self._reply_json(200, art.meta)
            else:
                self._reply_json(404, {"error": f"no route {path}"})
        except RequestError as e:
            self._reply_json(e.code, {"error": str(e)})

    def do_POST(self):
        # early-exit replies that leave the body unread must close the
        # connection: under HTTP/1.1 keep-alive the unread npz bytes
        # would otherwise be parsed as the NEXT request line
        path = urlsplit(self.path).path
        try:
            n = int(self.headers.get("Content-Length", 0))
        except ValueError:
            self.close_connection = True
            self._reply_json(400, {"error": "bad Content-Length"})
            return
        if path != "/pose":
            self.close_connection = True
            self._reply_json(404, {"error": f"no route {path}"})
            return
        if n <= 0 or n > self.service.max_body_bytes:
            self.close_connection = True
            self._reply_json(413 if n > 0 else 400, {
                "error": f"body size {n} outside (0, "
                         f"{self.service.max_body_bytes}] (4x the "
                         "largest artifact's full-batch npz)"})
            return
        try:
            try:
                raw = decode_arrays(self.rfile.read(n))
            except Exception as e:
                raise RequestError(400, f"body is not an npz: {e}")
            poses, ms = self.service.run(self._obj(), raw)
            self._reply(200, encode_arrays(
                {"poses": poses, "compute_ms": np.float32(ms)}),
                "application/octet-stream")
        except RequestError as e:
            self._reply_json(e.code, {"error": str(e)})
        except Exception as e:   # never kill the daemon on one request
            self._reply_json(500, {"error": f"{type(e).__name__}: {e}"})


def make_server(service: PoseService, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """Bound, ready-to-serve ThreadingHTTPServer (port 0 = ephemeral —
    read ``server.server_address`` for the bound port).  Caller runs
    ``serve_forever()`` (blocking) or on a thread; ``shutdown()`` stops."""
    handler = type("Handler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)


def request_poses(url: str, raw: dict, obj: str | None = None,
                  timeout: float = 120.0):
    """Client helper: POST raw arrays, return (poses [b,3,4], compute_ms).

    ``url`` is the server base, e.g. ``http://127.0.0.1:8360``.  Raises
    RuntimeError with the server's error message on non-200."""
    from urllib.error import HTTPError
    from urllib.parse import quote
    from urllib.request import Request, urlopen

    target = url.rstrip("/") + "/pose" + (
        f"?obj={quote(obj, safe='')}" if obj else "")
    req = Request(target, data=encode_arrays(raw),
                  headers={"Content-Type": "application/octet-stream"})
    try:
        with urlopen(req, timeout=timeout) as resp:
            out = decode_arrays(resp.read())
    except HTTPError as e:
        try:
            msg = json.loads(e.read().decode()).get("error", str(e))
        except Exception:
            msg = str(e)
        raise RuntimeError(f"pose request failed ({e.code}): {msg}")
    return out["poses"], float(out["compute_ms"])
