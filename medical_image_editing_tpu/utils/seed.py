"""Seeding.

Behavioral spec: reference `src/utils/init_seed.py` (InitSeedAndSaveConfig) —
per-rank seed from `config.run.seed_list` (or random), seeds all_gathered
across ranks and logged with the config.

TPU-native: one PRNG key per *process* derived from the configured seed; the
per-device decorrelation the reference gets from per-rank seeds is instead
achieved by folding data-shard identity into the batch (each replica sees
different data) while model randomness stays identical across replicas
(required for replicated params). `jax.random.fold_in` gives per-process keys
under multi-process training.
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
    key = jax.random.key(seed)
    if jax.process_count() > 1:
        key = jax.random.fold_in(key, proc)
    print(f"Seed set to {seed} in process {proc}")
    return key, logged
