"""Minimal HTTP inference server around an exported serving artifact.

Demonstrates the deployment story end-to-end: a forecaster exported with
``python -m vae_gp_ode_tpu.serving`` is served over plain HTTP with
nothing but jax + the Python stdlib (no model code, no flax, no torch).

  python tools/serve_http.py --artifact forecaster.jaxexport \
      [--port 8089] [--device cpu]

API (JSON over POST):
  POST /predict   {"x": <nested list, shape (N, T, 1, 28, 28)>,
                   "seed": 0}
              ->  {"y": <nested list>, "shape": [...], "ms": ...}
  GET  /health   ->  {"ok": true, "input_shape": [...], "platforms": [...]}

Single-threaded by design (one TPU chip, one compiled program); put a
real load balancer in front for production fan-out.
"""

import argparse
import json
import sys
import os
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_handler(fc):
    import numpy as np

    class Handler(BaseHTTPRequestHandler):
        # bound every socket read: a client that promises a large
        # Content-Length and then stalls would otherwise block the
        # single-threaded server inside rfile.read() forever, wedging
        # /health and every later request
        timeout = 30

        def _reply(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/health':
                self._reply(200, {
                    'ok': True,
                    'input_shape': [str(d) for d in fc.input_shape],
                    'platforms': list(fc.platforms)})
            else:
                self._reply(404, {'error': 'unknown path'})

        def do_POST(self):
            if self.path != '/predict':
                self._reply(404, {'error': 'unknown path'})
                return
            try:
                n = int(self.headers.get('Content-Length', 0))
                raw = self.rfile.read(n)
            except OSError:
                # the client never delivered its promised body (socket
                # timeout); the connection is unusable - drop it
                self.close_connection = True
                return
            try:
                req = json.loads(raw)
                x = np.asarray(req['x'], dtype=np.float32)
                seed = int(req.get('seed', 0))
            except Exception as e:  # malformed request -> client fault
                self._reply(400, {'error': f'{type(e).__name__}: {e}'})
                return
            want = fc.input_shape  # symbolic dims (e.g. batch 'b') skipped
            if len(x.shape) != len(want) or any(
                    isinstance(w, int) and w != s
                    for w, s in zip(want, x.shape)):
                self._reply(400, {
                    'error': f'x has shape {list(x.shape)}, artifact '
                             f'expects {[str(d) for d in want]}'})
                return
            try:
                t0 = time.perf_counter()
                y = np.asarray(fc(x, seed=seed))
                ms = (time.perf_counter() - t0) * 1e3
                self._reply(200, {'y': y.tolist(),
                                  'shape': list(y.shape),
                                  'ms': round(ms, 2)})
            except Exception as e:  # noqa: BLE001 - execution fault (e.g.
                # artifact/platform mismatch, bad shape for the compiled
                # program) -> server-side error class
                self._reply(500, {'error': f'{type(e).__name__}: {e}'})

        def log_message(self, fmt, *a):
            print(f'[serve_http] {fmt % a}', file=sys.stderr)

    return Handler


def main():
    p = argparse.ArgumentParser('Serve an exported forecaster over HTTP')
    p.add_argument('--artifact', required=True)
    p.add_argument('--host', default='127.0.0.1')
    p.add_argument('--port', type=int, default=8089)
    p.add_argument('--device', default=None,
                   help='force the jax platform (e.g. cpu)')
    a = p.parse_args()
    if a.device:
        import jax
        jax.config.update('jax_platforms', a.device)
    from vae_gp_ode_tpu import serving
    fc = serving.load_forecaster(a.artifact)
    srv = HTTPServer((a.host, a.port), make_handler(fc))
    print(json.dumps({'serving': a.artifact, 'host': a.host,
                      'port': srv.server_address[1]}), flush=True)
    srv.serve_forever()


if __name__ == '__main__':
    main()
