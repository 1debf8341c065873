"""Orbax checkpointing with the reference's save/retention/staged-restore
capability matrix.

Behavioral spec (SURVEY.md §5 checkpoint/resume):
  * the whole training state — encoder/decoder/discriminator params, three
    Adam states, VQ buffers (embed/cluster_size/embed_avg — these MUST be
    checkpointed or the codebook is lost, `vq_module.py:154-157`), step/epoch —
    is one pytree saved per epoch (`ModelSaver`, `run_vqwnet.py:72-80`);
  * retention: keep the newest `limit_num` checkpoints; older ones survive
    only every `save_interval` epochs (`src/utils/logger.py:79-91`);
  * staged loading: restore only the encoder/decoder of a first-stage
    checkpoint into a second-stage state (`src/trainers/base.py:85-102`), the
    discriminator separately (`:104-114`), or everything for full resume
    (`run_vqwnet.py:126`) — here `restore_fields` is the prefix-selective
    analogue of the reference's state_dict key surgery.
"""

import os
import re
from typing import Optional, Sequence

import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"ckpt-epoch=(\d+)")


def _ckpt_name(epoch: int) -> str:
    return f"ckpt-epoch={epoch:04d}"


class CheckpointManager:
    """Epoch checkpoints with the ModelSaver retention policy.

    `use_async=True` overlaps the checkpoint write with the next epoch's
    compute (Orbax writes to a temp dir and renames on commit, so partially
    written checkpoints are never visible to `latest_epoch`/`restore` — a
    preemption mid-write loses only that save). The next `save` waits for the
    previous write first, and `close()` must run before process exit.
    """

    def __init__(self, directory: str, limit_num: int = 10, save_interval: int = 10,
                 use_async: bool = False):
        self.directory = os.path.abspath(directory)
        self.limit_num = limit_num
        self.save_interval = save_interval
        self.use_async = use_async
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # -- save / prune -------------------------------------------------------
    def save(self, state, epoch: int):
        path = os.path.join(self.directory, _ckpt_name(epoch))
        # serialize against any in-flight async write (Orbax requires one
        # outstanding save per checkpointer)
        self._ckptr.wait_until_finished()
        self._prune()
        self._ckptr.save(path, state, force=True)
        if not self.use_async:
            self._ckptr.wait_until_finished()
            self._prune()
        return path

    def wait_until_finished(self):
        self._ckptr.wait_until_finished()

    def close(self):
        """Flush the in-flight async write. Call before process exit."""
        self._ckptr.wait_until_finished()
        self._prune()

    def _epochs(self) -> Sequence[int]:
        out = []
        for bn in os.listdir(self.directory):
            m = _CKPT_RE.fullmatch(bn)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _prune(self):
        """Keep newest limit_num; older kept only every save_interval epochs.
        Spec: `logger.py:79-91` (including the (epoch+1) % interval test)."""
        import shutil

        epochs = self._epochs()
        if len(epochs) <= self.limit_num:
            return
        margin = len(epochs) - self.limit_num
        for e in epochs[:margin]:
            if (e + 1) % self.save_interval != 0:
                shutil.rmtree(os.path.join(self.directory, _ckpt_name(e)))

    # -- restore ------------------------------------------------------------
    def latest_epoch(self) -> Optional[int]:
        epochs = self._epochs()
        return epochs[-1] if epochs else None

    def restore(self, target, epoch: Optional[int] = None):
        """Full state restore (resume_from_checkpoint parity)."""
        if epoch is None:
            epoch = self.latest_epoch()
            if epoch is None:
                raise FileNotFoundError(f"no checkpoints in {self.directory}")
        path = os.path.join(self.directory, _ckpt_name(epoch))
        return self._ckptr.restore(path, target=target)


def restore_fields(ckpt_dir_or_path: str, target_state, fields: Sequence[str],
                   epoch: Optional[int] = None):
    """Prefix-selective restore: copy only the named TrainState fields (e.g.
    ('enc_vars','dec_vars','vq') for first-stage init, ('dis_vars',) for a
    pretrained discriminator) from a saved checkpoint into `target_state`.

    The functional analogue of the reference's key-prefix state_dict surgery
    (`base.py:85-114`, `run_recon.py:98-112`).
    """
    path = ckpt_dir_or_path
    if not _CKPT_RE.search(os.path.basename(os.path.normpath(path))):
        mgr = CheckpointManager(path)
        e = epoch if epoch is not None else mgr.latest_epoch()
        if e is None:
            raise FileNotFoundError(f"no checkpoints in {path}")
        path = os.path.join(mgr.directory, _ckpt_name(e))
    ckptr = ocp.StandardCheckpointer()
    full = ckptr.restore(os.path.abspath(path), target=target_state)
    updates = {f: getattr(full, f) for f in fields}
    return target_state.replace(**updates)
