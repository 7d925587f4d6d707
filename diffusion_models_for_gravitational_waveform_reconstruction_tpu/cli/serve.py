"""``gw-serve``: serve reconstructions from an exported sampler artifact.

Framework extension — no reference counterpart: the reference "serves" by
re-running its Python/torch inference script per measurement
(``/root/reference/src/snr_denoising/inference.py:517-903``), needing the
source tree, torch, and a checkpoint on every host.  ``gw-serve`` needs
ONLY a ``gw-export`` artifact (StableHLO + JSON sidecar): the weights and
the whole deployment recipe are baked into the compiled program, so the
serving host never loads model code or checkpoints.

Two modes:

- **batch** (``--input X.npz --output Y.npz``): one-shot file mode.  The
  input ``.npz`` holds ``cond_stack (n, C, L) float32`` (the whitened,
  σ-normalised measurement stack, see the sidecar's calling convention)
  and ``sigmas (n,) float32``; writes ``x0_white (n, L)`` plus the request
  seed.  ``n`` is arbitrary — requests are chunked/padded to the
  artifact's static batch (``serving.run_batched``).
- **HTTP** (``--http PORT``): stdlib threading server.
  ``POST /reconstruct`` with an ``.npz`` body (same keys, optional
  ``seed``) returns an ``.npz`` with ``x0_white``; ``GET /contract``
  returns the sidecar JSON; ``GET /healthz`` liveness.  Requests are
  serialised around the single accelerator via a lock — the artifact's
  internal batching is the throughput lever, not HTTP concurrency.
"""
import argparse
import io
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        "gw-serve", description=__doc__.split("\n")[0],
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--artifact", required=True,
                   help="gw-export output (.stablehlo; sidecar .json "
                        "must sit next to it)")
    m = p.add_mutually_exclusive_group(required=True)
    m.add_argument("--input", default=None,
                   help="Batch mode: request .npz (cond_stack, sigmas)")
    m.add_argument("--http", type=int, default=None, metavar="PORT",
                   help="HTTP mode: listen on PORT (0 = ephemeral)")
    p.add_argument("--output", default=None,
                   help="Batch mode: response .npz path (required with "
                        "--input)")
    p.add_argument("--seed", type=int, default=0,
                   help="Base sampling seed (batch mode / HTTP default)")
    p.add_argument("--host", default="127.0.0.1",
                   help="HTTP bind address")
    return p


def make_server(artifact: str, host: str = "127.0.0.1", port: int = 0,
                default_seed: int = 0) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server for an artifact.

    Separated from ``main`` so tests can run it on an ephemeral port in a
    thread and call ``server.shutdown()``.
    """
    from ..serving import load_exported, run_batched

    call, contract = load_exported(artifact)
    if contract is None:
        raise FileNotFoundError(f"missing sidecar {artifact}.json")
    lock = threading.Lock()     # one accelerator: serialise executions

    class Handler(BaseHTTPRequestHandler):
        server_version = "gw-serve/1"

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):     # quiet: one line per request
            # log_error routes here with single-arg formats ("Request timed
            # out: %r") — indexing args[1] unconditionally would turn a
            # benign timeout into a handler traceback (ADVICE r3)
            detail = args[1] if len(args) > 1 else (fmt % args if args else fmt)
            print(f"[serve] {self.command} {self.path} {detail}",
                  file=sys.stderr)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, b"ok", "text/plain")
            elif self.path == "/contract":
                self._send(200, json.dumps(contract).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/reconstruct":
                self._send(404, b"not found", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                data = np.load(io.BytesIO(self.rfile.read(n)),
                               allow_pickle=False)
                seed = (int(np.asarray(data["seed"]).item())
                        if "seed" in data else default_seed)
            except Exception as e:     # payload boundary: junk zip, missing
                                        # keys, bad ints are the CLIENT's 400
                self._send(400, f"bad request: {e}".encode(), "text/plain")
                return
            try:
                with lock:
                    x0 = run_batched(call, contract, data["cond_stack"],
                                     data["sigmas"], seed=seed)
            except (KeyError, ValueError) as e:   # shape/key mismatch vs the
                                                  # artifact contract: client
                self._send(400, f"bad request: {e}".encode(), "text/plain")
                return
            except Exception as e:  # device/backend faults are SERVER errors
                                    # (ADVICE r3: misreporting them as 400
                                    # hides the need for operator action)
                self._send(500, f"server error: {e}".encode(), "text/plain")
                return
            buf = io.BytesIO()
            np.savez(buf, x0_white=x0, seed=np.int32(seed))
            self._send(200, buf.getvalue(), "application/octet-stream")

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.http is not None:
        srv = make_server(args.artifact, args.host, args.http, args.seed)
        host, port = srv.server_address[:2]
        print(f"[serve] listening on http://{host}:{port} "
              f"(POST /reconstruct, GET /contract, GET /healthz)")
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            srv.server_close()
        return 0

    if not args.output:
        print("[serve] --output is required with --input", file=sys.stderr)
        return 2
    from ..serving import load_exported, run_batched

    call, contract = load_exported(args.artifact)
    if contract is None:
        print(f"[serve] ERROR: missing sidecar {args.artifact}.json",
              file=sys.stderr)
        return 2
    data = np.load(args.input, allow_pickle=False)
    try:
        x0 = run_batched(call, contract, data["cond_stack"], data["sigmas"],
                         seed=args.seed)
    except (KeyError, ValueError) as e:
        print(f"[serve] ERROR: {e}", file=sys.stderr)
        return 2
    np.savez(args.output, x0_white=x0, seed=np.int32(args.seed))
    print(f"[serve] {x0.shape[0]} reconstructions -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
