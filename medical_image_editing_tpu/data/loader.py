"""Host batch loader with background prefetch and device double-buffering.

Behavioral spec: reference `src/dataio/data_loader.py` (`get_data_loader`) —
mode×dataset factory assembling per-dataset transforms (ToTensor → optional
RandomAffine(±5°, translate 0.01, scale 0.9–1.1)/HFlip → NormalizeIntensity for
BraTS/CRC), shuffling train/val but not test, wrapping a torch DataLoader with
num_workers/drop_last.

TPU-first: numpy batches are assembled on the host (optionally on a background
thread — this box's equivalent of `num_workers`) and `prefetch_to_device`
keeps `size` batches resident on the accelerator so HBM transfer overlaps the
previous step. Host-side augmentations keep scipy-based parity; the heavier
dual-view RandomTransform augmentation runs on device inside the jitted step.
"""

import queue
import threading
from typing import Iterator, Optional

import numpy as np

try:  # scipy is available in this image; gate anyway
    from scipy import ndimage as _ndimage
except Exception:  # pragma: no cover
    _ndimage = None

from .datasets import (
    CRCDataset,
    MICCAIBraTSDataset,
    NCCLungDataset,
    SyntheticSliceDataset,
)


# ---------------------------------------------------------------------------
# host-side per-sample transforms (spec: src/dataio/transforms.py)
# ---------------------------------------------------------------------------


def normalize_intensity_np(image, vmin=0.0, vmax=255.0):
    """clamp → [-1,1]. Spec: `transforms.py:52-71`."""
    image = np.clip(image, vmin, vmax)
    image = (image - vmin) / (vmax - vmin)
    return image * 2.0 - 1.0


def random_affine_np(rng, image, p=0.5, degrees=(-5, 5), translate=(0.01, 0.01),
                     scale=(0.9, 1.1)):
    """Host-side RandomAffine parity (`data_loader.py:35-38` params)."""
    if _ndimage is None or rng.random() >= p:
        return image
    h, w = image.shape[:2]
    angle = np.deg2rad(rng.uniform(*degrees))
    s = rng.uniform(*scale)
    tx = rng.uniform(-translate[0], translate[0]) * w
    ty = rng.uniform(-translate[1], translate[1]) * h
    cos, sin = np.cos(angle) * s, np.sin(angle) * s
    lin = np.array([[cos, -sin], [sin, cos]], np.float64)
    center = np.array([(h - 1) / 2.0, (w - 1) / 2.0])
    offset = center + np.array([ty, tx]) - lin @ center
    return _affine_apply(image, lin, offset)


def _affine_apply(image, lin, offset):
    """Apply x_out = lin·x_in + offset via scipy's inverse-map convention."""
    inv = np.linalg.inv(lin)
    inv_offset = -inv @ offset
    return _ndimage.affine_transform(
        image, inv, offset=inv_offset, order=1, mode="constant", cval=0.0
    )


def random_hflip_np(rng, image, p=0.5):
    if rng.random() < p:
        return image[:, ::-1].copy()
    return image


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------


def _collate(samples):
    images = np.stack([s["image"] for s in samples]).astype(np.float32)
    if images.ndim == 3:
        images = images[..., None]  # (B,H,W,1) NHWC
    return {
        "image": images,
        "patient_id": [s["patient_id"] for s in samples],
        "slice_num": np.asarray([s["slice_num"] for s in samples], np.int32),
    }


class DataLoader:
    """Minimal epoch iterator: shuffle, batch, collate, optional background
    producer thread (the `num_workers` seam)."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = False,
        transform=None,
        num_workers: int = 0,
        seed: int = 0,
        prefetch_batches: int = 2,
        use_native: bool = True,
        shard_by_process: bool = True,
        native_epilogue=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.transform = transform
        self.num_workers = num_workers
        self.prefetch_batches = prefetch_batches
        self._epoch = 0
        self._seed = seed
        # multi-host: shard the sample space across processes (the functional
        # analogue of DDP's DistributedSampler, which Lightning installs
        # implicitly — run_vqwnet.py:112-127). Same seed everywhere keeps the
        # permutation consistent; each process takes a strided slice.
        self._process_shard = (1, 0)
        if shard_by_process:
            try:
                import jax

                self._process_shard = (jax.process_count(), jax.process_index())
            except Exception:
                pass
        # native C++ batch loading (GIL-free thread pool) is usable when the
        # samples come straight from fixed-size .npy files and the per-sample
        # transform is either absent or expressible as a native elementwise
        # epilogue (`native_epilogue=(kind, p0, p1, p2)`, e.g. the CRC/BraTS
        # NormalizeIntensity); HU windowing / the epilogue are fused into the
        # per-slice worker pass.
        self._native = False
        if use_native and (transform is None or native_epilogue is not None):
            from . import native_loader

            files = getattr(dataset, "files", None)
            if (
                files
                and all(f.get("image_path") for f in files[: min(len(files), 4)])
                and native_loader.is_available()
            ):
                self._native = True
                self._native_window = getattr(dataset, "window", None)
                self._native_epilogue = native_epilogue
                assert not (self._native_window and native_epilogue), (
                    "dataset-level windowing and a transform epilogue cannot "
                    "both apply natively"
                )

    def __len__(self):
        """Batches per epoch FOR THIS PROCESS (DistributedSampler semantics:
        the per-process strided shard, not the global dataset)."""
        n = len(self.dataset)
        pcount, pidx = self._process_shard
        if pcount > 1:
            n = len(range(pidx, n, pcount))
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        """Pin the next iteration's permutation to `epoch` (DistributedSampler
        semantics). Makes the data order a pure function of (seed, epoch) so a
        resumed run replays the same order as an uninterrupted one."""
        self._epoch = int(epoch)

    def epoch_iterator(self, epoch: int, skip_batches: int = 0) -> Iterator[dict]:
        """Iterate epoch `epoch`, skipping its first `skip_batches` batches
        without loading them (mid-epoch resume: the skipped ones were already
        consumed before preemption). Honors `num_workers` like `__iter__`."""
        self.set_epoch(epoch)
        return self._iterate(skip_batches=skip_batches)

    def _batch_specs(self, skip_batches: int = 0):
        """[(bi, idx array)] for the current epoch (advances the epoch
        counter, like starting an iteration does)."""
        n = len(self.dataset)
        epoch = self._epoch
        rng = np.random.default_rng(self._seed + epoch)
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        pcount, pidx = self._process_shard
        if pcount > 1:
            order = order[pidx::pcount]
            n = len(order)
        self._epoch += 1
        specs = []
        for bi, start in enumerate(range(0, n, self.batch_size)):
            idx = order[start : start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                break
            if bi < skip_batches:
                continue
            specs.append((bi, idx))
        return epoch, specs

    def _load_batch(self, epoch: int, bi: int, idx) -> dict:
        """Materialize one batch. Pure in (epoch, bi, idx): the transform rng
        is a function of (seed, epoch, batch index), so batches can be built
        on any worker in any order and a mid-epoch resume replays the exact
        augmentation stream of an uninterrupted run."""
        if self._native:
            batch = self._native_batch(idx)
            if batch is not None:
                return batch
        sample_rng = np.random.default_rng(
            np.random.SeedSequence([self._seed & 0xFFFFFFFF, epoch, bi])
        )
        samples = []
        for i in idx:
            s = self.dataset[int(i)]
            if self.transform is not None:
                s = dict(s)
                s["image"] = self.transform(sample_rng, s["image"])
            samples.append(s)
        return _collate(samples)

    def _batches(self, skip_batches: int = 0) -> Iterator[dict]:
        epoch, specs = self._batch_specs(skip_batches)
        for bi, idx in specs:
            yield self._load_batch(epoch, bi, idx)

    def _native_batch(self, idx):
        """C++ thread-pool batch load (native/medimg_io.cpp); None → fallback."""
        from . import native_loader

        files = [self.dataset.files[int(i)] for i in idx]
        paths = [f["image_path"] for f in files]
        probe = np.load(paths[0], mmap_mode="r")
        if probe.ndim != 2:
            self._native = False
            return None
        h, w = probe.shape
        try:
            images = native_loader.load_npy_batch(
                paths, h, w, window=self._native_window,
                epilogue=self._native_epilogue,
            )
        except Exception:
            self._native = False
            return None
        return {
            "image": images[..., None],
            "patient_id": [f["patient_id"] for f in files],
            "slice_num": np.asarray([f["slice_num"] for f in files], np.int32),
        }

    def __iter__(self) -> Iterator[dict]:
        return self._iterate(skip_batches=0)

    def _iterate(self, skip_batches: int = 0) -> Iterator[dict]:
        """num_workers semantics (torch DataLoader parity, threads instead of
        processes — numpy/scipy IO and the C++ loader release the GIL):
        0 → synchronous; 1 → one background producer; N → a pool of N
        workers building whole batches concurrently, yielded IN ORDER (the
        per-batch (seed, epoch, bi) rng makes results order-independent)."""
        if self.num_workers <= 0:
            yield from self._batches(skip_batches=skip_batches)
            return
        if self.num_workers == 1 or self._native:
            # the native path is already a hardware_concurrency C++ thread
            # pool per batch — stacking N python workers on top would
            # oversubscribe the host N×cores deep; one background producer
            # suffices to overlap it with device compute
            yield from self._background_single(skip_batches)
            return
        from concurrent.futures import ThreadPoolExecutor

        epoch, specs = self._batch_specs(skip_batches)
        window = self.num_workers + max(2, self.prefetch_batches)
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        pending = {}
        try:
            submit_iter = iter(specs)
            for _ in range(min(window, len(specs))):
                bi, idx = next(submit_iter)
                pending[bi] = pool.submit(self._load_batch, epoch, bi, idx)
            for bi, _ in specs:
                yield pending.pop(bi).result()
                try:
                    nbi, nidx = next(submit_iter)
                except StopIteration:
                    continue
                pending[nbi] = pool.submit(self._load_batch, epoch, nbi, nidx)
        finally:
            # abandoned mid-epoch (max_steps break): drop queued work and do
            # NOT block on in-flight batches — the consumer is gone
            pool.shutdown(wait=False, cancel_futures=True)

    def _background_single(self, skip_batches: int) -> Iterator[dict]:
        q: "queue.Queue" = queue.Queue(maxsize=max(2, self.prefetch_batches))
        _sentinel = object()
        gen = self._batches(skip_batches=skip_batches)

        def produce():
            try:
                for b in gen:
                    q.put(b)
            finally:
                q.put(_sentinel)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is _sentinel:
                break
            yield b


def prefetch_to_device(iterator, size: int = 2, sharding=None, put_fn=None):
    """Double-buffered device prefetch of the 'image' field.

    Keeps `size` batches in flight on the accelerator so the HBM copy of batch
    i+1 overlaps step i (SURVEY.md §7 design stance). `put_fn` overrides the
    placement (e.g. multi-process global-array assembly); default is
    `jax.device_put` with `sharding`.
    """
    import collections

    import jax

    buf = collections.deque()
    if put_fn is None:
        put_fn = lambda image: jax.device_put(image, sharding)

    def put(batch):
        device_batch = dict(batch)
        device_batch["image"] = put_fn(batch["image"])
        buf.append(device_batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            put(next(it))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            put(next(it))
        except StopIteration:
            pass
        yield out


def get_data_loader(
    mode: str,
    dataset_name: str,
    root_dir_path: str,
    batch_size: int,
    num_workers: int = 0,
    modality: Optional[str] = None,
    augmentations: Optional[list] = None,
    drop_last: bool = False,
    window_width: Optional[float] = None,
    window_center: Optional[float] = None,
    window_scale: Optional[float] = None,
    seed: int = 0,
) -> DataLoader:
    """Factory with the reference's exact mode×dataset behavior
    (`data_loader.py:15-149`): train applies optional host augs + intensity
    normalization (BraTS/CRC) and shuffles; val normalizes + shuffles; test
    normalizes, no shuffle."""
    assert mode in {"train", "val", "test"}, mode
    assert dataset_name in {
        "MICCAIBraTSDataset",
        "NCCLungDataset",
        "CRCDataset",
        "SyntheticSliceDataset",
    }, dataset_name
    # NB: the reference trains with drop_last=False (ragged tail batch);
    # here train drops the tail so the jitted step never retraces on a new
    # batch shape (documented jit-friendliness divergence).
    augmentations = augmentations or []
    if mode != "train":
        assert not augmentations, "augmentations are train-only (data_loader.py:49,90,124)"

    needs_intensity_norm = dataset_name in {"MICCAIBraTSDataset", "CRCDataset"}
    shuffle = mode in {"train", "val"}

    steps = []
    if mode == "train":
        if "RandomAffineTransform" in augmentations:
            steps.append(lambda rng, im: random_affine_np(rng, im))
        if "RandomHorizontalFlipTransform" in augmentations:
            steps.append(lambda rng, im: random_hflip_np(rng, im))
    if needs_intensity_norm:
        steps.append(lambda rng, im: normalize_intensity_np(im))

    def transform(rng, image):
        for f in steps:
            image = f(rng, image)
        return image.astype(np.float32)

    # NormalizeIntensity as the ONLY transform (CRC/BraTS without host-side
    # train augmentations) is an elementwise map → servable by the native
    # loader as a fused per-slice epilogue; the python `transform` stays as
    # the no-native fallback.
    native_epilogue = None
    if needs_intensity_norm and len(steps) == 1:
        from . import native_loader

        native_epilogue = (native_loader.EP_INTENSITY, 0.0, 255.0)

    if dataset_name == "MICCAIBraTSDataset":
        dataset = MICCAIBraTSDataset(root_dir_path, modality=modality)
    elif dataset_name == "NCCLungDataset":
        dataset = NCCLungDataset(
            root_dir_path,
            window_width=window_width,
            window_center=window_center,
            window_scale=window_scale,
            seed=seed,
        )
    elif dataset_name == "CRCDataset":
        dataset = CRCDataset(root_dir_path, seed=seed)
    else:
        dataset = SyntheticSliceDataset(seed=seed)

    return DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=shuffle,
        drop_last=drop_last,
        transform=transform if steps else None,
        num_workers=num_workers,
        seed=seed,
        native_epilogue=native_epilogue,
    )
