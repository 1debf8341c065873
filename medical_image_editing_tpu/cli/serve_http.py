"""HTTP editing service: POST an id map, get the decoded image back.

Production-serving counterpart of the file-watching `run_recon` server (the
reference's only serving surface is that 1 Hz polling loop,
`/root/reference/src/run_recon.py:164-238`). Zero new dependencies — stdlib
`http.server` with a threading server; the TPU work is the same single
jit-compiled codebook-lookup + decode dispatch as `run_recon`/`edit_batch`,
kept resident between requests.

API:
  GET  /healthz          → JSON {status, config, dict_size, device}
  POST /edit             → body: .npy bytes, int id map (H,W) or (B,H,W);
                           0 = background. Response: .npy float32 recon of
                           the same leading shape (or ?format=png for an
                           8-bit grayscale PNG of the first slice).
                           Header X-Edit-Ms reports device latency.

Shapes are static per XLA compilation: the first request of a new shape pays
a compile; subsequent ones are a single dispatch. Batch sizes are bucketed to
the next power of two by default (`--bucket pow2`) so the server compiles a
BOUNDED set of shapes no matter what batch sizes clients send; deploy with
the spatial shapes you serve warmed (e.g. `--warm 1x512x512,32x512x512`).
"""

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def build_service(config):
    """(decoder, state) from a run_recon-style config object."""
    from .run_recon import load_model

    _, decoder, state = load_model(config)
    return decoder, state


def bucket_batch(b: int, bucketing: str, multiple: int = 1) -> int:
    """Dispatch batch size for a b-slice request.

    XLA compiles once per static shape, and a compile through this
    environment's tunnel can stall a request for 20-40 s — a server must see
    a BOUNDED set of batch sizes, not one per distinct client batch.
    'pow2' pads b up to the next power of two (≤ log2(Bmax) compiles per
    (H,W) instead of one per B; worst-case 2× padded compute on a cold size);
    'exact' dispatches b as-is. Either way the result is rounded up to
    `multiple` (shard_map's batch-divisibility requirement under
    partition='data'). Padded slices are replicas of the last id map and are
    sliced off before the response.
    """
    if bucketing == "pow2":
        b = 1 << (b - 1).bit_length()
    return b + (-b % multiple)


class EditService:
    def __init__(self, config, partition: str = "none",
                 batch_bucketing: str = "pow2"):
        import jax

        from .edit_batch import make_batched_edit_fn

        self.config = config
        self.partition = partition
        self.decoder, self.state = build_service(config)
        mesh = None
        if partition != "none":
            import numpy as np
            from jax.sharding import Mesh

            from ..parallel import DATA_AXIS, SPATIAL_AXIS

            axis = DATA_AXIS if partition == "data" else SPATIAL_AXIS
            mesh = Mesh(np.asarray(jax.devices()), (axis,))
        kw = dict(
            is_lung=config.config_name == "LungConfig",
            dataset_window=(config.window_width, config.window_center,
                            config.window_scale),
            mesh=mesh,
            partition="data" if partition == "none" else partition,
        )
        self.edit_fn = make_batched_edit_fn(self.decoder, **kw)
        # PNG responses decode straight to uint8 on device: 4× smaller
        # device→host transfer (~13% lower p50 at 512², PERF.md)
        self.edit_fn_u8 = make_batched_edit_fn(
            self.decoder, output_dtype="uint8", **kw
        )
        self.device = str(jax.devices()[0])
        assert batch_bucketing in {"pow2", "exact"}, batch_bucketing
        self.batch_bucketing = batch_bucketing
        # 'data' sharding requires batch % n_devices == 0 (shard_map);
        # requests of any size are padded up to the multiple and sliced back
        self._batch_multiple = len(jax.devices()) if partition == "data" else 1
        self._lock = threading.Lock()  # serialize device dispatch per request

    def edit(self, ids, uint8: bool = False):
        import jax.numpy as jnp
        import numpy as np

        squeeze = ids.ndim == 2
        if squeeze:
            ids = ids[None]
        b = ids.shape[0]
        pad = bucket_batch(b, self.batch_bucketing, self._batch_multiple) - b
        if pad:
            ids = np.concatenate([ids, np.repeat(ids[-1:], pad, axis=0)])
        fn = self.edit_fn_u8 if uint8 else self.edit_fn
        t0 = time.perf_counter()
        with self._lock:
            recon = np.asarray(
                fn(self.state.dec_vars, self.state.vq,
                   jnp.asarray(ids.astype(np.int32)))
            )
        ms = (time.perf_counter() - t0) * 1000.0
        recon = recon[:b]
        return (recon[0] if squeeze else recon), ms


def make_handler(service: EditService):
    import numpy as np

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code, body, ctype, extra=None):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in (extra or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.split("?")[0] != "/healthz":
                self._send(404, b"not found", "text/plain")
                return
            info = {
                "status": "ok",
                "config": service.config.config_name,
                "dict_size": int(service.config.dict_size),
                "device": service.device,
                "partition": service.partition,
                "batch_bucketing": service.batch_bucketing,
            }
            self._send(200, json.dumps(info).encode(), "application/json")

        def do_POST(self):
            path, _, query = self.path.partition("?")
            if path != "/edit":
                self._send(404, b"not found", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                ids = np.load(io.BytesIO(self.rfile.read(n)), allow_pickle=False)
                if ids.ndim not in (2, 3):
                    raise ValueError(f"id map must be 2-D or 3-D, got {ids.shape}")
                if ids.size == 0:
                    # a (0,H,W) batch would otherwise reach the dispatch path
                    raise ValueError(f"empty id map (shape {ids.shape})")
            except Exception as e:  # malformed request body
                self._send(400, str(e).encode(), "text/plain")
                return
            want_png = "format=png" in query
            try:
                recon, ms = service.edit(ids, uint8=want_png)
            except Exception as e:  # device/compile failure — a server error
                self._send(500, str(e).encode(), "text/plain")
                return
            extra = {"X-Edit-Ms": f"{ms:.2f}"}
            if want_png:
                from PIL import Image

                img = recon if recon.ndim == 2 else recon[0]
                buf = io.BytesIO()
                Image.fromarray(img).save(buf, format="PNG")
                self._send(200, buf.getvalue(), "image/png", extra)
            else:
                buf = io.BytesIO()
                np.save(buf, recon.astype(np.float32), allow_pickle=False)
                self._send(200, buf.getvalue(), "application/octet-stream", extra)

    return Handler


def serve(config, host="127.0.0.1", port=8760, warm_shapes=((1, 512, 512),),
          partition: str = "none", batch_bucketing: str = "pow2"):
    """Build the service, optionally pre-compile shapes, serve forever."""
    import numpy as np

    service = EditService(config, partition=partition,
                          batch_bucketing=batch_bucketing)
    for shape in warm_shapes or ():
        service.edit(np.zeros(shape, np.int32))
        service.edit(np.zeros(shape, np.int32), uint8=True)
        print(f"warmed {shape}")
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    print(f"edit service on http://{host}:{port} ({service.device})")
    httpd.serve_forever()


def main(argv=None):
    from ..utils.config import load_dotenv
    from .run_recon import CRCConfig, LungConfig

    load_dotenv()
    parser = argparse.ArgumentParser(description="HTTP editing service")
    parser.add_argument("--config", choices=["lung", "crc"], default="lung")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8760)
    parser.add_argument("--warm", default="1x512x512",
                        help="comma-separated BxHxW shapes to pre-compile, "
                             "or 'none'")
    parser.add_argument("--partition", choices=["none", "data", "spatial"],
                        default="none",
                        help="shard each dispatch over all local devices: "
                        "'data' = batch axis (throughput), 'spatial' = image "
                        "rows via GSPMD (latency)")
    parser.add_argument("--dtype", choices=["f32", "bf16"], default=None,
                        help="decode compute dtype (bf16 cuts TPU edit "
                             "latency; params/checkpoints stay f32)")
    parser.add_argument("--bucket", choices=["pow2", "exact"], default="pow2",
                        help="batch-size bucketing: 'pow2' pads requests up "
                        "to the next power of two so the server compiles a "
                        "bounded set of shapes; 'exact' compiles per distinct "
                        "batch size")
    args = parser.parse_args(argv)

    from . import cli_setup

    cli_setup("serve-edit")
    config = LungConfig() if args.config == "lung" else CRCConfig()
    if args.dtype:
        config.compute_dtype = {"f32": None, "bf16": "bfloat16"}[args.dtype]
    warm = ()
    if args.warm and args.warm != "none":
        warm = tuple(
            tuple(int(d) for d in s.split("x")) for s in args.warm.split(",")
        )
    serve(config, host=args.host, port=args.port, warm_shapes=warm,
          partition=args.partition, batch_bucketing=args.bucket)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
