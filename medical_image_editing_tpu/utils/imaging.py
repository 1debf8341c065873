"""Image export helpers (matplotlib/PIL) and the label colormap.

Behavioral spec: reference `src/utils/__init__.py:67-78,162-189` (`to_image`,
`save_image`, `save_fused_image`, `subplot_image`) and the `CMAP='Spectral'`
constant (`src/trainers/base.py:43`). The reference's `save_images`
(`:117-159`) references an undefined CMAP — reimplemented here working
(document-and-diverge, SURVEY.md §7 quirks list).
"""

import numpy as np

CMAP = "Spectral"  # label-map colormap, `src/trainers/base.py:43`


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def to_image(array, is_ids: bool = False, retain_batch: bool = False):
    """Device array → numpy for display. Spec: `src/utils/__init__.py:67-78`.

    NHWC here: images (B,H,W,C) → first sample's first channel; id maps
    (B,H,W) → first sample.
    """
    array = np.asarray(array)
    if retain_batch:
        return array if is_ids else array[..., 0]
    return array[0] if is_ids else array[0, ..., 0]


def save_image(image, cmap, vmin, vmax, path):
    """Single matplotlib imshow → PNG. Spec: `src/utils/__init__.py:162-167`."""
    plt = _plt()
    plt.axis("off")
    plt.imshow(np.asarray(image), cmap=cmap, vmin=vmin, vmax=vmax)
    plt.savefig(path, bbox_inches="tight", dpi=300)
    plt.clf()


def save_fused_image(image1, cmap1, vmin1, vmax1, image2, cmap2, vmin2, vmax2,
                     alpha, path):
    """Label overlay (alpha-blended). Spec: `src/utils/__init__.py:170-177`."""
    plt = _plt()
    plt.axis("off")
    plt.imshow(np.asarray(image1), cmap=cmap1, vmin=vmin1, vmax=vmax1)
    plt.imshow(np.asarray(image2), cmap=cmap2, vmin=vmin2, vmax=vmax2, alpha=alpha)
    plt.savefig(path, bbox_inches="tight", dpi=300)
    plt.clf()


def subplot_image(image, title, cmap, vmin, vmax, x, y, z, fontsize: int = 5):
    """One cell of a snapshot grid. Spec: `src/utils/__init__.py:180-189`."""
    plt = _plt()
    plt.subplot(x, y, z)
    plt.axis("off")
    plt.gca().title.set_fontsize(fontsize)
    plt.gca().title.set_text(title)
    image = np.asarray(image)
    if vmin is None:
        vmin = image.min()
    if vmax is None:
        vmax = image.max()
    plt.imshow(image, cmap=cmap, vmin=vmin, vmax=vmax)


def save_snapshot_grid(path: str, panels, n_row: int, n_col: int, dpi: int = 512):
    """Render a list of (image, title, cmap, vmin, vmax, cell_index) panels.

    The functional replacement for the trainers' inline snapshot plotting
    (e.g. `single_window_trainer.py:161-260`).
    """
    plt = _plt()
    for image, title, cmap, vmin, vmax, z in panels:
        subplot_image(image, title, cmap, vmin, vmax, x=n_row, y=n_col, z=z, fontsize=3)
    plt.savefig(path, bbox_inches="tight", dpi=dpi)
    plt.clf()


def save_image_grid(images: np.ndarray, path: str, nrow: int = 8,
                    pad: int = 2, pad_value: float = 0.0):
    """Tile (B,H,W,C) images in [0,1] into one PNG (torchvision
    `save_image` semantics, used by Logger.log_images — `logger.py:257-263`)."""
    from PIL import Image

    images = np.asarray(images, dtype=np.float32)
    if images.ndim == 3:
        images = images[..., None]
    b, h, w, c = images.shape
    ncol = min(nrow, b)
    nrow_ = (b + ncol - 1) // ncol
    grid = np.full(
        (nrow_ * (h + pad) + pad, ncol * (w + pad) + pad, c), pad_value, np.float32
    )
    for i in range(b):
        r, col = divmod(i, ncol)
        y0 = pad + r * (h + pad)
        x0 = pad + col * (w + pad)
        grid[y0 : y0 + h, x0 : x0 + w] = images[i]
    grid = np.clip(grid * 255.0, 0, 255).astype(np.uint8)
    if c == 1:
        grid = grid[..., 0]
    Image.fromarray(grid).save(path)
