"""KDE histogram-mode finders for MR intensity normalization.

Behavioral spec: reference `src/utils/hist.py` (vendored from
intensity-normalization; NB unused by any reference module — kept for API
completeness, SURVEY.md §2.7): gaussian-KDE smoothed histogram on an 80-point
grid with bandwidth max/80, then largest / first / last local-maximum modes
with optional tail removal by percentile.

Implemented with numpy + scipy (`gaussian_kde` replaces the statsmodels
KDEUnivariate FFT estimator; same gaussian kernel and bandwidth).
"""

import numpy as np
from scipy.signal import argrelmax
from scipy.stats import gaussian_kde


def smooth_hist(data, gridsize: int = 80):
    """KDE-smoothed histogram. Spec: `hist.py:18-37`.

    Returns (grid, pdf) with pdf scaled ×100 like the reference.
    """
    data = np.asarray(data).flatten().astype(np.float64)
    bw = data.max() / 80.0
    kde = gaussian_kde(data, bw_method=bw / max(data.std(ddof=1), 1e-12))
    grid = np.linspace(data.min(), data.max(), gridsize)
    pdf = 100.0 * kde(grid)
    return grid, pdf


def get_largest_mode(data):
    """Intensity at the histogram's largest peak. Spec: `hist.py:40-52`."""
    grid, pdf = smooth_hist(data)
    return grid[np.argmax(pdf)]


def _trim_tail(data, rare_prop):
    data = np.asarray(data)
    rare_thresh = np.percentile(data, rare_prop)
    return data[~(data >= rare_thresh)]


def get_last_mode(data, rare_prop: float = 96, remove_tail: bool = True):
    """Last reliable histogram peak. Spec: `hist.py:55-75`."""
    if remove_tail:
        data = _trim_tail(data, rare_prop)
    grid, pdf = smooth_hist(data)
    maxima = argrelmax(pdf)[0]
    return grid[maxima[-1]]


def get_first_mode(data, rare_prop: float = 99, remove_tail: bool = True):
    """First reliable histogram peak. Spec: `hist.py:78-99`."""
    if remove_tail:
        data = _trim_tail(data, rare_prop)
    grid, pdf = smooth_hist(data)
    maxima = argrelmax(pdf)[0]
    return grid[maxima[0]]
