"""Seeding.

Behavioral spec: reference `src/utils/init_seed.py` (InitSeedAndSaveConfig) —
per-rank seed from `config.run.seed_list` (or random), seeds all_gathered
across ranks and logged with the config.

TPU-native: the JAX key must be IDENTICAL on every process — replicated state
under the data mesh is assembled from host-local copies
(`parallel.replicate`), so param init / k-means / `state.rng` have to agree.
That is the torch-DDP equivalent of the rank-0 parameter broadcast at wrap
time; multi-process runs broadcast process 0's seed for the key. Per-DEVICE
stream decorrelation (augmentation/dropout/CutMix) happens inside the train
steps via `train.state.per_device_keys` (axis_index fold), and per-process
numpy/python seeds keep the reference's per-rank host seeding (harmless:
host RNG never partitions data — loader order is a pure function of its own
seed).
"""

import random
from typing import List, Optional, Tuple

import jax
import numpy as np


def init_seed(seed_list: Optional[List[int]] = None) -> Tuple[jax.Array, List[int]]:
    """Returns (prng_key, seed_list_logged). Spec: `init_seed.py:14-35`."""
    proc = jax.process_index()
    if seed_list:
        seed = int(seed_list[proc % len(seed_list)])
        logged = list(seed_list)
    else:
        seed = random.randint(1, 10000)
        logged = [seed]
    np.random.seed(seed)
    random.seed(seed)
    key_seed = seed
    if jax.process_count() > 1:
        # all processes must derive the same key (module docstring); process
        # 0's seed wins even when seed_list gave each rank its own
        from jax.experimental import multihost_utils

        key_seed = int(multihost_utils.broadcast_one_to_all(np.int64(seed)))
    key = jax.random.key(key_seed)
    print(f"Seed set to {seed} in process {proc} (jax key seed {key_seed})")
    return key, logged
