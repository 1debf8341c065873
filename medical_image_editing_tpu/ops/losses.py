"""Loss functions.

Behavioral specs:
  embedding_loss          — reference `src/functions/embed_loss.py` (EmbeddingLoss)
  hinge/vanilla d loss    — reference `src/functions/gan_loss.py`
  focal_frequency_loss    — external `focal-frequency-loss==0.3.0` used at
                            `src/trainers/base.py:277-278` (FFL(loss_weight=1, alpha=1));
                            reimplemented from the FFL paper/official semantics.
  soft_dice_loss / focal_loss — reference `src/functions/seg_loss.py`.

TPU-first: the reference's cross loss materializes a (B,C,K,HW) broadcast
(`embed_loss.py:52-58`); here the squared distance is expanded as
‖e‖² − 2·e·c + ‖c‖² so everything reduces to MXU matmuls over (B·HW, C)×(C, K),
never materializing the 4-D tensor. Exact same math.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-6  # EmbeddingLoss.epsilon, `embed_loss.py:8`


def embedding_cross_loss(embed, r_ids, codebook):
    """One direction of the augmentation-equivariance cross loss.

    embed:    (B,H,W,C) view-A encoder features (pre-VQ).
    r_ids:    (B,H,W,K) one-hot warped ids of the *other* view, background
              channel already dropped by the caller.
    codebook: (K,C), gradients stopped (reference detaches, `embed_loss.py:52`).

    Spec: `embed_loss.py:46-66` — per (b,k): mean over assigned locations of
    ‖e − c_k‖², then mean over the (b,k) pairs that are present in the map.
    """
    b = embed.shape[0]
    c = embed.shape[-1]
    k = r_ids.shape[-1]
    e = embed.reshape(b, -1, c).astype(jnp.float32)           # (B,L,C)
    r = r_ids.reshape(b, -1, k).astype(jnp.float32)           # (B,L,K)
    cb = jax.lax.stop_gradient(codebook.astype(jnp.float32))  # (K,C)

    counts = jnp.sum(r, axis=1)                                # (B,K)
    e_sq = jnp.sum(e * e, axis=-1)                             # (B,L)
    # Σ_loc r·‖e‖², Σ_loc r·(e·c_k), counts·‖c_k‖² — all matmuls.
    term_e = jnp.einsum("bl,blk->bk", e_sq, r, precision=jax.lax.Precision.HIGHEST)
    e_dot_c = jnp.einsum("blc,kc->blk", e, cb, precision=jax.lax.Precision.HIGHEST)
    term_x = jnp.einsum("blk,blk->bk", e_dot_c, r, precision=jax.lax.Precision.HIGHEST)
    term_c = counts * jnp.sum(cb * cb, axis=-1)[None, :]

    cross = (term_e - 2.0 * term_x + term_c) / (counts + _EPS)  # (B,K)
    present = counts > 0
    total = jnp.sum(jnp.where(present, cross, 0.0))
    return total / jnp.maximum(jnp.sum(present), 1)


def embedding_distance_loss(codebook, margin):
    """Hinge pushing all centroid pairs ≥ 2·margin apart.

    Spec: `embed_loss.py:68-84`. NB the reference's pair sum includes the
    diagonal (i==j contributes (2·margin)²) and divides by 2K(K−1); replicated
    exactly.
    """
    cb = codebook.astype(jnp.float32)  # (K,C)
    k = cb.shape[0]
    sq = jnp.sum(cb * cb, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * jnp.dot(
        cb, cb.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    hinge = jnp.maximum(2.0 * margin - d, 0.0) ** 2
    return jnp.sum(hinge) / (2.0 * k * (k - 1))


def embedding_regularization_loss(codebook):
    """Mean L2 norm of the codebook vectors. Spec: `embed_loss.py:86-88`."""
    return jnp.mean(jnp.linalg.norm(codebook.astype(jnp.float32), axis=-1))


def embedding_loss(
    embed_1,
    r_ids_1,
    embed_2,
    r_ids_2,
    codebook,
    *,
    margin: float = 1.0,
    use_distance_loss: bool = True,
    use_regularization_loss: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Symmetric cross + distance + regularization. Spec: `embed_loss.py:22-44`.

    Layouts are NHWC/ (B,H,W,K) here vs the reference's NCHW — same math.
    """
    l_cross = embedding_cross_loss(embed_1, r_ids_2, codebook) + embedding_cross_loss(
        embed_2, r_ids_1, codebook
    )
    l_dist = (
        embedding_distance_loss(codebook, margin) if use_distance_loss else jnp.float32(0.0)
    )
    l_reg = (
        embedding_regularization_loss(codebook)
        if use_regularization_loss
        else jnp.float32(0.0)
    )
    return l_cross, l_dist, l_reg


# ---------------------------------------------------------------------------
# GAN losses — spec: `src/functions/gan_loss.py`
# ---------------------------------------------------------------------------


def hinge_d_loss(logits_real, logits_fake):
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real)) + jnp.mean(jax.nn.softplus(logits_fake))
    )


def hinge_g_loss(logits_fake):
    """Generator hinge: −mean(D(fake)). Spec: the trainers' `-torch.mean(...)`
    usage, e.g. `src/trainers/single_window_trainer.py:296-298`."""
    return -jnp.mean(logits_fake)


# ---------------------------------------------------------------------------
# Focal frequency loss (FFT-domain reconstruction loss)
# ---------------------------------------------------------------------------


def focal_frequency_loss(
    pred, target, alpha: float = 1.0, log_matrix: bool = False, use_rfft: bool = True
):
    """Focal Frequency Loss (Jiang et al., ICCV'21), alpha=1, patch_factor=1.

    Used by the reference as `FFL(loss_weight=1.0, alpha=1.0)(recon, image)`
    (`src/trainers/base.py:277-278`). pred/target: (B,H,W,C) in NHWC.

    Per-sample/channel: F = fft2(x, norm='ortho'); freq distance
    d = |F_p − F_t|²; spectrum weight w = (√d)^alpha normalized by its max
    (per sample-channel), clamped to [0,1], gradient-stopped; loss = mean(w·d).

    TPU perf: real inputs have conjugate-symmetric spectra, so with
    `use_rfft=True` (default) only the half-spectrum is computed (rfft2) and
    the redundant columns are double-counted — exactly equal to the full-fft
    value (the per-spectrum max used for the weight is also attained on the
    half-spectrum by symmetry). Set use_rfft=False for the literal fft2 form.
    """
    # NHWC → (B,C,H,W) for per-channel FFT clarity
    p = jnp.transpose(pred, (0, 3, 1, 2)).astype(jnp.float32)
    t = jnp.transpose(target, (0, 3, 1, 2)).astype(jnp.float32)
    h, w_full = p.shape[-2], p.shape[-1]

    if use_rfft:
        fp = jnp.fft.rfft2(p, norm="ortho")
        ft = jnp.fft.rfft2(t, norm="ortho")
    else:
        fp = jnp.fft.fft2(p, norm="ortho")
        ft = jnp.fft.fft2(t, norm="ortho")
    diff = fp - ft
    dist = diff.real**2 + diff.imag**2  # (B,C,H,W) or (B,C,H,W//2+1)

    w = jnp.sqrt(dist) ** alpha
    if log_matrix:
        w = jnp.log(w + 1.0)
    wmax = jnp.max(w, axis=(-2, -1), keepdims=True)
    w = jnp.where(wmax > 0, w / wmax, 0.0)
    w = jnp.clip(jnp.nan_to_num(w), 0.0, 1.0)
    w = jax.lax.stop_gradient(w)

    if not use_rfft:
        return jnp.mean(w * dist)
    # column multiplicity: DC (and Nyquist for even W) appear once in the full
    # spectrum; interior rfft columns represent a conjugate pair → weight 2.
    ncols = dist.shape[-1]
    col = jnp.arange(ncols)
    mult = jnp.where((col == 0) | ((w_full % 2 == 0) & (col == ncols - 1)), 1.0, 2.0)
    total = jnp.sum(w * dist * mult[None, None, None, :])
    b, c = dist.shape[0], dist.shape[1]
    return total / (b * c * h * w_full)


# ---------------------------------------------------------------------------
# Segmentation losses — spec: `src/functions/seg_loss.py` (exported, unused by
# the reference trainers; kept for API completeness)
# ---------------------------------------------------------------------------


def soft_dice_loss(output, target, ignore_index=None, smooth: float = 1e-6):
    """output: (B,H,W,K) logits, target: (B,H,W,K) one-hot. Spec: `seg_loss.py:15-43`."""
    probs = jax.nn.softmax(output, axis=-1)
    k = probs.shape[-1]
    p = probs.reshape(-1, k).T  # (K, N)
    t = target.reshape(-1, k).astype(jnp.float32).T
    intersect = jnp.sum(p * t, axis=-1)
    denominator = jnp.sum(p, axis=-1) + jnp.sum(t, axis=-1)
    if ignore_index is not None:
        keep = jnp.arange(k) != ignore_index
        intersect = jnp.where(keep, intersect, 0.0)
        denominator = jnp.where(keep, denominator, 0.0)
    dice = 2.0 * jnp.sum(intersect) / jnp.maximum(jnp.sum(denominator), smooth)
    return 1.0 - dice


def focal_loss(output, target, gamma: float = 2.0):
    """output: (B,H,W,K) logits, target one-hot. Spec: `seg_loss.py:46-62`."""
    eps = 1e-6
    p = jnp.clip(jax.nn.softmax(output, axis=-1), eps, 1.0 - eps)
    log_p = jax.nn.log_softmax(output, axis=-1)
    loss_sce = -target * log_p
    loss_focal = jnp.sum(loss_sce * (1.0 - p) ** gamma, axis=-1)
    return jnp.mean(loss_focal)
