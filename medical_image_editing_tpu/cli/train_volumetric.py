"""3-D volumetric VQ training CLI (beyond-parity stretch: BASELINE config #5).

Trains the volumetric VQ-WNet (`models/volumetric.py`) on a directory of 3-D
`.npy` volumes (one fixed-shape array per file; any dtype convertible to
float32, values normalized to [-1, 1] with --vmin/--vmax) or, with no
--data-dir, on synthetic structured volumes for smoke/benchmarking.

Parallelism: `--mesh data,spatial` (e.g. `--mesh 2,4`) jits the step over a
2-D device mesh with volumes depth-sharded over 'spatial' — XLA's SPMD
partitioner inserts the halo exchanges the 3-D convs need (see
`train/volumetric.py` and the HLO evidence in PERF.md). Defaults to
single-device.

Outputs: Orbax checkpoint + center-slice recon PNGs under --out.
"""

import argparse
import glob
import os


def _load_volumes(data_dir, vmin, vmax):
    import numpy as np

    paths = sorted(glob.glob(os.path.join(data_dir, "*.npy")))
    if not paths:
        raise SystemExit(f"no .npy volumes under {data_dir}")
    vols = []
    shape = None
    for p in paths:
        v = np.load(p).astype(np.float32)
        if v.ndim != 3:
            raise SystemExit(f"{p}: expected 3-D volume, got shape {v.shape}")
        if shape is None:
            shape = v.shape
        elif v.shape != shape:
            raise SystemExit(f"{p}: shape {v.shape} != first volume {shape}")
        v = np.clip(v, vmin, vmax)
        v = (v - vmin) / (vmax - vmin) * 2.0 - 1.0
        vols.append(v)
    return np.stack(vols)[..., None]  # (N, D, H, W, 1)


def _synthetic_volumes(n, size, seed):
    """Smooth blobs on a gradient — structured enough for the VQ to learn."""
    import numpy as np

    rng = np.random.default_rng(seed)
    zz, yy, xx = np.meshgrid(*[np.linspace(-1, 1, size)] * 3, indexing="ij")
    vols = []
    for _ in range(n):
        v = 0.3 * zz
        for _ in range(4):
            c = rng.uniform(-0.7, 0.7, 3)
            r = rng.uniform(0.15, 0.4)
            d2 = (zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2
            v = v + rng.uniform(0.4, 1.0) * np.exp(-d2 / (2 * r * r))
        vols.append(np.tanh(v).astype(np.float32))
    return np.stack(vols)[..., None]


def main(argv=None):
    parser = argparse.ArgumentParser(description="3-D volumetric VQ trainer")
    parser.add_argument("--data-dir", default=None,
                        help=".npy 3-D volumes; omit for synthetic volumes")
    parser.add_argument("--vmin", type=float, default=-1000.0)
    parser.add_argument("--vmax", type=float, default=1000.0)
    parser.add_argument("--size", type=int, default=64,
                        help="synthetic volume edge length")
    parser.add_argument("--n-synthetic", type=int, default=16)
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--filters", default="8,16,32,64")
    parser.add_argument("--dict-size", type=int, default=10)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--mesh", default=None,
                        help="'data,spatial' device counts, e.g. '2,4'")
    parser.add_argument("--out", default="volumetric_out")
    parser.add_argument("--log-every", type=int, default=20)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from . import cli_setup

    cli_setup("train-volumetric")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..train.volumetric import (
        create_volumetric_mesh,
        init_volumetric,
        make_volumetric_train_step,
    )
    from ..utils.imaging import save_image_grid

    if args.data_dir:
        data = _load_volumes(args.data_dir, args.vmin, args.vmax)
    else:
        data = _synthetic_volumes(args.n_synthetic, args.size, args.seed)
    n, d, h, w, _ = data.shape
    print(f"{n} volumes of {d}x{h}x{w}")

    filters = tuple(int(f) for f in args.filters.split(","))
    enc, dec, enc_vars, dec_vars, vq, enc_tx, dec_tx = init_volumetric(
        jax.random.key(args.seed), filters=filters, dict_size=args.dict_size,
        volume_shape=(args.batch, d, h, w, 1), lr=args.lr,
    )

    mesh = None
    if args.mesh:
        md, ms = (int(x) for x in args.mesh.split(","))
        mesh = create_volumetric_mesh(jax.devices()[: md * ms], md, ms)
        print(f"mesh: data={md} x spatial={ms}")
    step = make_volumetric_train_step(enc, dec, enc_tx, dec_tx, mesh=mesh)
    enc_opt, dec_opt = enc_tx.init(enc_vars["params"]), dec_tx.init(dec_vars["params"])

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        vol_sharding = NamedSharding(mesh, P("data", "spatial"))
    else:
        vol_sharding = None

    rng = np.random.default_rng(args.seed)
    for i in range(args.steps):
        idx = rng.choice(n, args.batch, replace=n < args.batch)
        vol = jnp.asarray(data[idx])
        if vol_sharding is not None:
            vol = jax.device_put(vol, vol_sharding)
        if mesh is not None:
            with mesh:
                enc_vars, dec_vars, vq, enc_opt, dec_opt, metrics = step(
                    enc_vars, dec_vars, vq, enc_opt, dec_opt, vol
                )
        else:
            enc_vars, dec_vars, vq, enc_opt, dec_opt, metrics = step(
                enc_vars, dec_vars, vq, enc_opt, dec_opt, vol
            )
        if (i + 1) % args.log_every == 0 or i == 0 or i + 1 == args.steps:
            print(f"step {i + 1}: total={float(metrics['total']):.4f} "
                  f"recon={float(metrics['recon']):.4f} "
                  f"commit={float(metrics['commit']):.4f}", flush=True)

    os.makedirs(args.out, exist_ok=True)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    path = os.path.abspath(os.path.join(args.out, "volumetric_ckpt"))
    ckptr.save(path, {"enc": enc_vars, "dec": dec_vars,
                      "vq": {"embed": vq.embed,
                             "cluster_size": vq.cluster_size,
                             "embed_avg": vq.embed_avg}}, force=True)
    ckptr.wait_until_finished()
    print(f"checkpoint: {path}")

    # center-slice recon panel: input | recon for the first batch
    from ..models.volumetric import volumetric_forward

    vol = jnp.asarray(data[:args.batch])
    recon, _, _, _ = volumetric_forward(enc, dec, enc_vars, dec_vars, vq, vol,
                                        train=False)
    mid = d // 2
    panel = np.concatenate([
        np.asarray(vol[:, mid]), np.asarray(recon[:, mid])
    ])  # (2B, H, W, 1) in [-1, 1]
    save_image_grid((panel + 1.0) / 2.0, os.path.join(args.out, "recon_mid.png"),
                    nrow=args.batch)
    print(f"recon panel: {os.path.join(args.out, 'recon_mid.png')}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
