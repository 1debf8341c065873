"""Capture an XLA profiler trace of the flagship step and itemize device time
per fusion (VERDICT r2 weak #7 / next-round item 9).

The round-2 MFU case ("the decoder is conv-emitter-bound at reference-parity
channel widths") rested on in-situ ablations; this tool grounds it in the
profiler: `jax.profiler.trace` around N steady-state steps, then the
`.xplane.pb` is parsed with the in-env tensorflow xplane protobuf and device
-plane XEvents are aggregated by HLO program/op name into a top-K table
(total ms, ms/step, % of device time, occurrences).

Usage: python tools/profile_trace.py [--steps 5] [--top 25] [--out DIR]
       python tools/profile_trace.py --parse DIR   # re-parse an existing trace
"""

import argparse
import glob
import os
import sys
import tempfile
from collections import defaultdict

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def capture(trace_dir: str, steps: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from medical_image_editing_tpu.utils.compile_cache import enable_compile_cache
    sys.path.insert(0, HERE)
    from bench_donation import build  # same flagship config as bench.py

    enable_compile_cache()
    step_fn, state = build()
    jstep = jax.jit(step_fn, donate_argnums=(0,))
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(-1, 1, (8, 256, 256, 1)).astype(np.float32))
    w = jnp.float32(0.0)

    state, m = jstep(state, image, w)  # compile
    for _ in range(3):  # steady state
        state, m = jstep(state, image, w)
    jax.block_until_ready(m["total"])

    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            state, m = jstep(state, image, w)
        jax.block_until_ready(m["total"])
    assert np.isfinite(float(m["total"]))
    print(f"trace captured to {trace_dir} ({steps} steps)")


def _import_xplane_pb2():
    """The xplane proto moved between TF releases; try the known homes."""
    candidates = (
        "tensorflow.tsl.profiler.protobuf.xplane_pb2",  # this image's TF
        "tensorflow.core.profiler.protobuf.xplane_pb2",
        "tsl.profiler.protobuf.xplane_pb2",
        "xprof.protobuf.xplane_pb2",
    )
    import importlib

    for name in candidates:
        try:
            return importlib.import_module(name)
        except ImportError:
            continue
    raise ImportError(f"xplane_pb2 not found in any of {candidates}")


def parse(trace_dir: str, steps: int, top: int):
    xplane_pb2 = _import_xplane_pb2()

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    assert paths, f"no .xplane.pb under {trace_dir}"
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    rows = []
    for plane in space.planes:
        is_device = ("TPU" in plane.name and "XLA Ops" not in plane.name) or \
            plane.name.startswith("/device:")
        if not is_device:
            continue
        ev_meta = plane.event_metadata
        agg = defaultdict(lambda: [0.0, 0])  # name -> [total_ps, count]
        for line in plane.lines:
            # XLA Ops / XLA Modules lines carry per-op device occupancy
            if line.name not in ("XLA Ops", "XLA TraceMe", "Steps") and \
               "XLA" not in line.name and "stream" not in line.name.lower():
                pass
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                a = agg[(line.name, name)]
                a[0] += ev.duration_ps
                a[1] += 1
        for (line_name, name), (ps, cnt) in agg.items():
            rows.append((plane.name, line_name, name, ps, cnt))

    # prefer the "XLA Ops" line (per-fusion occupancy); fall back to all
    op_rows = [r for r in rows if r[1] == "XLA Ops"]
    if not op_rows:
        lines = sorted({(r[0], r[1]) for r in rows})
        print("available planes/lines:", lines)
        op_rows = rows
    total_ps = sum(r[3] for r in op_rows)
    op_rows.sort(key=lambda r: -r[3])
    print(f"\ndevice planes: {sorted({r[0] for r in op_rows})}")
    print(f"total device op time: {total_ps/1e9/steps:.2f} ms/step "
          f"over {steps} steps\n")
    print(f"{'ms/step':>9}  {'%dev':>6}  {'count':>6}  op")
    shown_ps = 0
    for plane, line, name, ps, cnt in op_rows[:top]:
        shown_ps += ps
        print(f"{ps/1e9/steps:9.3f}  {100*ps/max(total_ps,1):6.2f}  "
              f"{cnt:6d}  {name[:110]}")
    rest = total_ps - shown_ps
    print(f"{rest/1e9/steps:9.3f}  {100*rest/max(total_ps,1):6.2f}       "
          f"- (everything below top {top})")

    # ---- category rollup: the top-K table above is flat (no single op
    # dominates), so itemize the whole step by HLO instruction-name prefix —
    # XLA names fusions by their root/epilogue ops, which is enough to split
    # conv work from gathers, reduces, copies, and loop glue.
    cats = defaultdict(lambda: [0.0, 0])
    for plane, line, name, ps, cnt in op_rows:
        base = name.lstrip("%").split(" ")[0].split("=")[0]
        base = base.split(".")[0]
        cats[base][0] += ps
        cats[base][1] += cnt
    print(f"\n{'ms/step':>9}  {'%dev':>6}  {'count':>6}  category "
          f"(instruction-name prefix)")
    for base, (ps, cnt) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
        if ps / max(total_ps, 1) < 0.003:
            continue
        print(f"{ps/1e9/steps:9.3f}  {100*ps/max(total_ps,1):6.2f}  "
              f"{cnt:6d}  {base}")

    # ---- rollup by output shape: "where does the time go by resolution" —
    # the actionable cut for a U-Net (full-res rows vs bottleneck rows).
    import re

    shapes = defaultdict(lambda: [0.0, 0])
    for plane, line, name, ps, cnt in op_rows:
        m = re.search(r"=\s*\(?([a-z0-9]+\[[0-9,]*\])", name)
        shapes[m.group(1) if m else "?"][0] += ps
        shapes[m.group(1) if m else "?"][1] += cnt
    print(f"\n{'ms/step':>9}  {'%dev':>6}  {'count':>6}  output shape")
    for spec, (ps, cnt) in sorted(shapes.items(), key=lambda kv: -kv[1][0])[:20]:
        print(f"{ps/1e9/steps:9.3f}  {100*ps/max(total_ps,1):6.2f}  "
              f"{cnt:6d}  {spec}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--out", default=None)
    ap.add_argument("--parse", default=None,
                    help="skip capture; parse this trace dir")
    args = ap.parse_args()

    if args.parse:
        parse(args.parse, args.steps, args.top)
        return
    trace_dir = args.out or tempfile.mkdtemp(prefix="medimg_trace_")
    capture(trace_dir, args.steps)
    parse(trace_dir, args.steps, args.top)


if __name__ == "__main__":
    main()
