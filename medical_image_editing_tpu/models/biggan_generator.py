"""BigGAN Generator and the jointly-dispatched G+D pair.

Behavioral spec: reference `src/networks/unet_discriminator.py` — `G_arch`
channel tables (`:92-107`), `Generator` (`:109-330`, vendored from
boschresearch/unetgan), `G_D` (`:632-729`). This stack is dead code in the
reference (no trainer or CLI instantiates it — VERDICT round-1 row 14); it is
implemented here so the framework carries the reference's full model surface.

TPU-first: NHWC layouts, SN power iteration and BN running stats as
'batch_stats' collections, nearest upsampling via `jnp.repeat` (fuses into the
following conv's input pad under XLA). The first linear's (B, C·bw²) output is
reshaped channel-major then transposed to NHWC so transplanted torch weights
reproduce the reference exactly.

Reference crash notes (faithfully *not* reproduced — these raise ValueError
with the spec citation instead):
  * unconditional without hier: forward feeds y=None into the ccbn heads
    (`:313-316` → `biggan/layers.py:314`) — TypeError in torch.
  * unconditional + hier + G_shared: ccbn input_size is dim_z + shared_dim
    (`:196`) but forward passes y = z of width dim_z (`:305-306`) — shape
    mismatch in torch. Use G_shared=False for the unconditional generator.
  * conditional + hier + unshared: forward concatenates integer labels with
    float z chunks (`:311`) — torch.cat dtype crash (and the Embedding ccbn
    heads couldn't consume label⊕z vectors anyway). Use G_shared=True with
    hier.
  * `G_D.forward` unpacks `D_out, D_middle = self.D(...)` (`:687`) while
    `Unet_Discriminator.forward` returns three values (`:627`) — the wrapper
    crashes on its own discriminator; `GDPair` returns the full structure.

`Adam16` (`:21-86`, torch fp16 params with fp32 master copies) is deliberately
not ported as an optimizer class: on TPU the equivalent is bfloat16 *compute*
over float32 params, which is exactly the framework's `compute_dtype:
bfloat16` path (`train/state.py`) — master weights stay f32, the MXU runs bf16.
"""

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from .biggan_layers import Attention, GBlockCond, SNConv, SNDense

_ortho_init = nn.initializers.orthogonal()


def g_arch(resolution: int, ch: int):
    """Generator channel schedule. Spec: `unet_discriminator.py:92-107`."""
    if resolution == 256:
        in_mult, out_mult = [16, 16, 8, 8, 4, 2], [16, 8, 8, 4, 2, 1]
        res = [8, 16, 32, 64, 128, 256]
    elif resolution == 128:
        in_mult, out_mult = [16, 16, 8, 4, 2], [16, 8, 4, 2, 1]
        res = [8, 16, 32, 64, 128]
    else:
        raise ValueError(f"unsupported resolution {resolution} (reference ships 128/256)")
    return {
        "in_channels": [ch * m for m in in_mult],
        "out_channels": [ch * m for m in out_mult],
        "resolution": res,
    }


class BigGANGenerator(nn.Module):
    """z (B, dim_z) [, class labels] → image (B, res, res, 3) in tanh range.

    Constructor surface mirrors `Generator.__init__`
    (`unet_discriminator.py:110-120`): G_ch width, dim_z, bottom_width,
    resolution ∈ {128, 256}, G_attn resolutions, shared class embedding,
    hierarchical z, unconditional self-modulation.

    Conditioning contract matches the reference forward (`:297-316`): `y` is
    the *embedded* class vector — callers pass labels through `.shared()`
    first (`G_D` does this at `:650`). With `hier=True` (conditional), z must
    have width `(dim_z // (n_blocks+1)) * (n_blocks+1)` — the reference
    silently shrinks dim_z the same way (`:169-172`).
    """

    G_ch: int = 64
    dim_z: int = 128
    bottom_width: int = 4
    resolution: int = 128
    G_attn: str = "64"
    n_classes: int = 1000
    G_shared: bool = True
    shared_dim: int = 0
    hier: bool = False
    unconditional: bool = False
    norm_style: str = "bn"
    activation: Callable = nn.relu

    def setup(self):
        arch = g_arch(self.resolution, self.G_ch)
        n_blocks = len(arch["out_channels"])
        if self.unconditional:
            if not self.hier:
                raise ValueError(
                    "unconditional BigGAN generator requires hier=True: the "
                    "reference's non-hier unconditional forward feeds y=None "
                    "into ccbn (`unet_discriminator.py:313-316`) and crashes"
                )
            if self.G_shared:
                raise ValueError(
                    "unconditional BigGAN generator requires G_shared=False: "
                    "the reference sizes the self-modulation heads at "
                    "dim_z+shared_dim (`unet_discriminator.py:196`) but feeds "
                    "them z of width dim_z (`:305-306`) and crashes"
                )
        elif self.hier and not self.G_shared:
            raise ValueError(
                "conditional hier BigGAN generator requires G_shared=True: "
                "the reference's forward concatenates the integer labels with "
                "float z chunks (`unet_discriminator.py:311`), which crashes "
                "torch.cat on mixed dtypes — its Embedding ccbn heads expect "
                "plain labels, not label⊕z vectors"
            )
        self._arch = arch
        self._num_slots = n_blocks + 1 if self.hier else 1
        self._z_chunk = self.dim_z // self._num_slots if self.hier else 0
        self._shared_dim = self.shared_dim if self.shared_dim > 0 else self.dim_z

        if self.G_shared and not self.unconditional:
            # "non-spectral-normed embedding here regardless" (`:190-192`)
            self.shared_embed = nn.Embed(
                self.n_classes, self._shared_dim, embedding_init=_ortho_init
            )
        self.linear_in = SNDense(arch["in_channels"][0] * self.bottom_width**2)

        linear_type = "sn" if self.G_shared else "embed"
        attn_res = {int(s) for s in str(self.G_attn).split("_")}
        mods, y_index = [], []
        for i in range(n_blocks):
            mods.append(
                GBlockCond(
                    arch["out_channels"][i],
                    upsample=True,
                    linear_type=linear_type,
                    n_classes=self.n_classes,
                    norm_style=self.norm_style,
                    self_modulation=self.unconditional,
                    activation=self.activation,
                )
            )
            y_index.append(i)
            if arch["resolution"][i] in attn_res:
                mods.append(Attention())
                y_index.append(None)
        self.stage_modules = mods
        self._stage_y = tuple(y_index)

        # output layer: plain affine BN → act → SNConv(3) → tanh (`:247-253`)
        self.out_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        self.out_conv = SNConv(3, 3)

    def shared(self, y):
        """Class labels → embedded conditioning vector (`:215-216`); identity
        when unshared/unconditional, like the reference's `layers.identity`."""
        if self.G_shared and not self.unconditional:
            return self.shared_embed(y)
        return y

    def generate(self, z, y=None, train: bool = True):
        """Labels-in convenience: `G(z, G.shared(y))` — the call shape `G_D`
        uses (`:650`). Initialize through this method (`method=...generate`)
        so the shared embedding's params are created alongside the body's."""
        return self(z, self.shared(y), train=train)

    def __call__(self, z, y=None, train: bool = True):
        n_blocks = len(self._arch["out_channels"])
        if self.hier:
            if self.unconditional:
                ys = [z] * n_blocks
                h_in = z
            else:
                if z.shape[-1] != self._z_chunk * self._num_slots:
                    raise ValueError(
                        f"hier z must have width {self._z_chunk * self._num_slots} "
                        f"(z_chunk {self._z_chunk} × {self._num_slots} slots, "
                        f"`unet_discriminator.py:169-172`), got {z.shape[-1]}"
                    )
                zs = jnp.split(z, self._num_slots, axis=-1)
                h_in = zs[0]
                ys = [jnp.concatenate([y, zi], axis=-1) for zi in zs[1:]]
        else:
            ys = [y] * n_blocks
            h_in = z

        h = self.linear_in(h_in, train)
        b = h.shape[0]
        c0 = self._arch["in_channels"][0]
        # torch packs (B, C·bw²) channel-major into (B,C,bw,bw) (`:321`)
        h = h.reshape(b, c0, self.bottom_width, self.bottom_width)
        h = h.transpose(0, 2, 3, 1)

        for mod, y_idx in zip(self.stage_modules, self._stage_y):
            if y_idx is None:
                h = mod(h, train)
            else:
                h = mod(h, ys[y_idx], train)

        out = self.out_bn(h, use_running_average=not train)
        out = self.out_conv(self.activation(out), train)
        return jnp.tanh(out)


class GDPair(nn.Module):
    """One-dispatch G→D composition. Spec: `G_D` (`unet_discriminator.py:632-729`).

    The reference wraps G and D so DataParallel runs the generator and the
    fake+real discriminator pass in one replica-local call instead of
    all-gathering G's output; the TPU-native statement of the same idea is a
    single jitted apply in which XLA sees cat(fake, real) as one conv batch
    (one MXU tiling, no host round trip). Mixup/CutMix consistency lives in
    the trainers (`train/second_stage.py` replicates the reference's *used*
    CutMix path); the wrapper's own mixup plumbing is unreachable dead code
    that would crash on the 3-output UNet D (see module docstring).

    Returns a dict with the same schema in both modes: 'g_z',
    'd_fake'=(pixel_map, bottleneck), 'features_fake' (decoder feature list),
    and with a real batch also 'd_real' and 'features_real' (the joint path
    splits the concatenated batch's outputs back apart).
    """

    G: BigGANGenerator
    D: Any  # UNetDiscriminator (avoids a circular import at annotation time)

    def __call__(
        self,
        z,
        gy,
        x=None,
        dy=None,
        train_G: bool = False,
        split_D: bool = False,
        train: bool = True,
    ):
        g_z = self.G(z, self.G.shared(gy), train=train)
        if not train_G:
            # the reference disables G's grad tape when training D (`:648`)
            g_z = jax.lax.stop_gradient(g_z)

        conditional = getattr(self.D, "n_classes", 0) > 0
        if split_D:
            pix_f, mid_f, feats_f = self.D(g_z, train, y=gy if conditional else None)
            out = {"g_z": g_z, "d_fake": (pix_f, mid_f), "features_fake": feats_f}
            if x is not None:
                pix_r, mid_r, feats_r = self.D(x, train, y=dy if conditional else None)
                out.update({"d_real": (pix_r, mid_r), "features_real": feats_r})
            return out

        d_input = jnp.concatenate([g_z, x], axis=0) if x is not None else g_z
        d_class = None
        if conditional:
            d_class = jnp.concatenate([gy, dy], axis=0) if dy is not None else gy
        pix, mid, feats = self.D(d_input, train, y=d_class)
        if x is None:
            return {"g_z": g_z, "d_fake": (pix, mid), "features_fake": feats}
        nf = g_z.shape[0]
        return {
            "g_z": g_z,
            "d_fake": (pix[:nf], mid[:nf]),
            "d_real": (pix[nf:], mid[nf:]),
            "features_fake": [f[:nf] for f in feats],
            "features_real": [f[nf:] for f in feats],
        }
