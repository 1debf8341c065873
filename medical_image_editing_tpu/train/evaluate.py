"""Validation grids, test metrics (→ result.csv), and batch inference export.

Behavioral specs:
  validation_step   — reference `src/trainers/single_window_trainer.py:541-714`:
      rank-0 recon grids; CRC rows = [image, recon, ids, r_map, f_map]; other
      datasets rendered per window (lung/mediastinal).
  _test_step        — `:781-830`: NMSE/SSIM/PSNR + base-2 label entropy from
      id bincounts (background bin dropped), per-batch PNG + fused overlay.
  _test_epoch_end   — `:832-848`: avg/std per metric → `result.csv`.
  _inference        — `:716-779`: per-slice PNG + NIfTI export of
      image/recon/label keyed by patient_id/slice_num; lung window conversion
      for NCCLungDataset; vertical flip for CRCDataset.
  multi-window test — `multi_window_trainer.py:796-836`: per-slice
      HU-denormalized NIfTI export.

The device part (encode→VQ→decode [→ discriminator maps]) is one jitted
function; export/plotting stays on host, process-0 only.
"""

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.metrics import label_entropy, nmse, psnr, ssim
from ..utils.imaging import (
    CMAP,
    save_fused_image,
    save_image,
    subplot_image,
)
from ..utils.logging import is_main_process
from ..utils.nifti import save as nifti_save, to_nifti_array


def make_eval_forward(encoder, decoder):
    """Jitted eval forward: (state, image) → (recon, ids)."""

    @jax.jit
    def forward(state, image):
        q, _, ids, _, _ = encoder(state.enc_vars, state.vq, image, train=False)
        recon = decoder.apply(state.dec_vars, q, False)
        return recon, ids

    return forward


def make_test_metrics_fn(encoder, decoder, dict_size: int):
    """Jitted test metrics: (state, image) → metrics dict + (recon, ids)."""

    @jax.jit
    def fn(state, image):
        q, _, ids, _, _ = encoder(state.enc_vars, state.vq, image, train=False)
        recon = decoder.apply(state.dec_vars, q, False)
        metrics = {
            "NMSE": nmse(recon, image),
            "SSIM": ssim(recon, image),
            "PSNR": psnr(recon, image),
            "Entropy": label_entropy(ids, dict_size),
        }
        return metrics, recon, ids

    return fn


def test_step(
    forward_metrics,
    state,
    batch,
    batch_idx: int,
    *,
    dataset_name: str,
    dict_size: int,
    save_dir_path: Optional[str] = None,
):
    """One test batch → metric dict (+ CRC image exports). Spec: `:781-830`."""
    if not is_main_process():
        return None
    metrics, recon, ids = forward_metrics(state, batch["image"])
    out = {k: float(v) for k, v in metrics.items()}

    if save_dir_path is not None:
        # Reference parity note: the reference hard-raises NotImplementedError
        # for non-CRC test export (`single_window_trainer.py:822-823`). Fixed
        # equivalent here: export generically for every dataset; only CRC gets
        # the vertical flip (undoing its preprocessing flip, `:808-811`).
        os.makedirs(save_dir_path, exist_ok=True)
        s = str(batch_idx).zfill(4)
        flip = np.flipud if dataset_name == "CRCDataset" else (lambda a: a)
        img = flip(np.asarray(batch["image"])[0, ..., 0])
        rec = flip(np.asarray(recon)[0, ..., 0])
        idm = flip(np.asarray(ids)[0])
        save_image(img, "gray", -1, 1, os.path.join(save_dir_path, f"image_{s}.png"))
        save_image(rec, "gray", -1, 1, os.path.join(save_dir_path, f"recon_{s}.png"))
        save_image(idm, CMAP, 0, dict_size, os.path.join(save_dir_path, f"idx_{s}.png"))
        save_fused_image(
            rec, "gray", -1, 1, idm, CMAP, 0, dict_size, 0.3,
            os.path.join(save_dir_path, f"fused_{s}.png"),
        )
    return out


def test_epoch_end(outputs, save_dir_path: str):
    """avg/std per metric → result.csv. Spec: `:832-848`."""
    if not is_main_process() or not outputs:
        return None
    import pandas as pd

    result = {}
    for key in outputs[0].keys():
        values = [o[key] for o in outputs]
        result[key + "_avg"] = [float(np.mean(values))]
        result[key + "_std"] = [float(np.std(values))]
    df = pd.DataFrame.from_dict(result)
    os.makedirs(save_dir_path, exist_ok=True)
    path = os.path.join(save_dir_path, "result.csv")
    df.to_csv(path)
    return path


def inference_export(
    forward,
    state,
    batch,
    *,
    dataset_name: str,
    dict_size: int,
    save_root: str,
    study_name: str = "",
    to_lung_fn=None,
):
    """Batch editing-substrate export: per-slice PNG + NIfTI. Spec: `:716-779`."""
    if not is_main_process():
        return []
    recon, ids = forward(state, batch["image"])
    image = batch["image"]
    if dataset_name == "NCCLungDataset" and to_lung_fn is not None:
        image = to_lung_fn(jnp.asarray(image))
        recon = to_lung_fn(recon)
    image = np.asarray(image)
    recon = np.asarray(recon)
    ids = np.asarray(ids).astype(np.int32)

    written = []
    for i in range(image.shape[0]):
        patient_id = batch["patient_id"][i]
        slice_num = int(batch["slice_num"][i])
        img = image[i, ..., 0]
        rec = recon[i, ..., 0]
        idm = ids[i]
        if dataset_name == "CRCDataset":
            img, rec, idm = np.flipud(img), np.flipud(rec), np.flipud(idm)

        out_dir = os.path.join(save_root, study_name, patient_id)
        os.makedirs(out_dir, exist_ok=True)
        s = str(slice_num).zfill(4)

        save_image(img, "gray", -1, 1, os.path.join(out_dir, f"image_{s}.png"))
        save_image(rec, "gray", -1, 1, os.path.join(out_dir, f"recon_{s}.png"))
        save_image(idm, CMAP, 0, dict_size, os.path.join(out_dir, f"label_{s}.png"))

        nifti_save(to_nifti_array(img), os.path.join(out_dir, f"image_{s}.nii.gz"))
        nifti_save(to_nifti_array(rec), os.path.join(out_dir, f"recon_{s}.nii.gz"))
        nifti_save(
            to_nifti_array(idm), os.path.join(out_dir, f"label_{s}.nii.gz"),
            dtype=np.int32,
        )
        written.append(out_dir)
    return written


def multi_window_test_export(
    forward, state, batch, *, save_root: str, denormalize_fn,
):
    """HU-denormalized per-slice NIfTI export. Spec: `multi_window_trainer.py:796-836`."""
    if not is_main_process():
        return []
    recon, ids = forward(state, batch["image"])
    image = np.asarray(denormalize_fn(jnp.asarray(batch["image"])))
    recon = np.asarray(denormalize_fn(recon))
    ids = np.asarray(ids).astype(np.int32)
    written = []
    for i in range(image.shape[0]):
        out_dir = os.path.join(save_root, batch["patient_id"][i])
        os.makedirs(out_dir, exist_ok=True)
        s = str(int(batch["slice_num"][i])).zfill(4)
        nifti_save(to_nifti_array(image[i, ..., 0]),
                   os.path.join(out_dir, f"image_{s}.nii.gz"))
        nifti_save(to_nifti_array(recon[i, ..., 0]),
                   os.path.join(out_dir, f"recon_{s}.nii.gz"))
        nifti_save(to_nifti_array(ids[i]),
                   os.path.join(out_dir, f"label_{s}.nii.gz"), dtype=np.int32)
        written.append(out_dir)
    return written


def validation_snapshot(
    forward,
    state,
    batch,
    *,
    dataset_name: str,
    dict_size: int,
    n_save_images: int,
    save_path: str,
    dis_maps=None,
    to_lung_fn=None,
    to_mediastinal_fn=None,
    forward_outputs=None,
):
    """Rank-0 validation recon grid. Spec: `:541-714`.

    dis_maps: optional (r_map, f_map) arrays from the discriminator
    (second-stage validation); zeros otherwise (`:552-561`).
    forward_outputs: optional precomputed (recon, ids) — skips re-running
    `forward` when the caller already evaluated it (e.g. to feed dis_maps).
    """
    if not is_main_process():
        return None
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    recon, ids = (forward_outputs if forward_outputs is not None
                  else forward(state, batch["image"]))
    image = np.asarray(batch["image"])
    recon = np.asarray(recon)
    ids = np.asarray(ids)
    if dis_maps is None:
        r_map = f_map = np.zeros_like(image)
    else:
        r_map, f_map = (np.asarray(m) for m in dis_maps)

    n_rows = min(n_save_images, image.shape[0])
    # Raw grid for CRC — and for any dataset whose config lacks the
    # window_width/center/scale needed for HU converters (rather than
    # rendering degenerate constant panels). The 7-column layout with only
    # 5 panels filled, and the 'l_img'/'l_rec' labels on raw panels, are
    # reference quirks preserved verbatim (`single_window_trainer.py:577-596`).
    if (dataset_name == "CRCDataset" or to_lung_fn is None
            or to_mediastinal_fn is None):
        n_cols = 7
        for i in range(n_rows):
            subplot_image(image[i, ..., 0], "l_img", "gray", -1, 1, n_rows, n_cols, n_cols * i + 1)
            subplot_image(recon[i, ..., 0], "l_rec", "gray", -1, 1, n_rows, n_cols, n_cols * i + 2)
            subplot_image(ids[i], "ids", CMAP, 0, dict_size, n_rows, n_cols, n_cols * i + 3)
            subplot_image(r_map[i, ..., 0], "r_m", "gray", None, None, n_rows, n_cols, n_cols * i + 4)
            subplot_image(f_map[i, ..., 0], "f_m", "gray", None, None, n_rows, n_cols, n_cols * i + 5)
    else:
        l_image = np.asarray(to_lung_fn(jnp.asarray(image)))
        m_image = np.asarray(to_mediastinal_fn(jnp.asarray(image)))
        l_recon = np.asarray(to_lung_fn(jnp.asarray(recon)))
        m_recon = np.asarray(to_mediastinal_fn(jnp.asarray(recon)))
        n_cols = 7
        for i in range(n_rows):
            subplot_image(l_image[i, ..., 0], "l_img", "gray", -1, 1, n_rows, n_cols, n_cols * i + 1)
            subplot_image(l_recon[i, ..., 0], "l_rec", "gray", -1, 1, n_rows, n_cols, n_cols * i + 2)
            subplot_image(m_image[i, ..., 0], "m_img", "gray", -1, 1, n_rows, n_cols, n_cols * i + 3)
            subplot_image(m_recon[i, ..., 0], "m_rec", "gray", -1, 1, n_rows, n_cols, n_cols * i + 4)
            subplot_image(ids[i], "ids", CMAP, 0, dict_size, n_rows, n_cols, n_cols * i + 5)
            subplot_image(r_map[i, ..., 0], "r_m", "gray", None, None, n_rows, n_cols, n_cols * i + 6)
            subplot_image(f_map[i, ..., 0], "f_m", "gray", None, None, n_rows, n_cols, n_cols * i + 7)

    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    plt.savefig(save_path, bbox_inches="tight", dpi=300)
    plt.clf()
    return save_path
