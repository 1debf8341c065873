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

Mid-epoch (periodic) saves get step-tagged names (`ckpt-epoch=E-step=S`) so
they never overwrite a committed checkpoint in place: Orbax's `force=True`
deletes the destination before the (possibly async) rewrite commits, which
would create a window where a preemption loses the epoch entirely. With
distinct names, pruning happens only after the NEXT save has confirmed a
newer committed checkpoint, so at least one recent committed checkpoint
exists at every instant.
"""

import os
import re
from typing import Optional, Sequence, Tuple

import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"ckpt-epoch=(\d+)(?:-step=(\d+))?")


def _ckpt_name(epoch: int, step: Optional[int] = None) -> str:
    if step is None:
        return f"ckpt-epoch={epoch:04d}"
    return f"ckpt-epoch={epoch:04d}-step={step:08d}"


def _sort_key(entry: Tuple[int, Optional[int]]):
    """Order checkpoints by recency: an epoch-end save for epoch E holds the
    state AFTER all of E's batches, so it outranks any step-tagged (E, s)."""
    epoch, step = entry
    return (epoch, float("inf") if step is None else step)


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
    def save(self, state, epoch: int, step: Optional[int] = None):
        """Save. `step` marks a mid-epoch (periodic/preemption-safety) save;
        epoch-end saves omit it."""
        path = os.path.join(self.directory, _ckpt_name(epoch, step))
        # serialize against any in-flight async write (Orbax requires one
        # outstanding save per checkpointer); after this, the previous save
        # is committed, so pruning below can never leave zero checkpoints
        self._ckptr.wait_until_finished()
        self._prune()
        _write_layout_sidecar(self.directory)
        self._ckptr.save(path, state, force=True)
        if not self.use_async:
            # synchronous: the new checkpoint is committed before pruning, so
            # eager retention is safe here (async defers it to the next save)
            self._ckptr.wait_until_finished()
            self._prune()
        return path

    def wait_until_finished(self):
        self._ckptr.wait_until_finished()

    def close(self):
        """Flush the in-flight async write. Call before process exit."""
        self._ckptr.wait_until_finished()
        self._prune()

    def _entries(self) -> Sequence[Tuple[int, Optional[int]]]:
        out = []
        for bn in os.listdir(self.directory):
            m = _CKPT_RE.fullmatch(bn)
            if m:
                out.append(
                    (int(m.group(1)),
                     int(m.group(2)) if m.group(2) else None)
                )
        return sorted(out, key=_sort_key)

    def _epochs(self) -> Sequence[int]:
        return sorted({e for e, s in self._entries() if s is None})

    def _prune(self):
        """Epoch-end: keep newest limit_num; older kept only every
        save_interval epochs (spec: `logger.py:79-91`, incl. the
        (epoch+1) % interval test). Step-tagged: keep only the newest entry
        overall if it is step-tagged — older mid-epoch saves are superseded."""
        import shutil

        entries = self._entries()
        tagged = [(e, s) for e, s in entries if s is not None]
        keep_tagged = set()
        if entries and entries[-1][1] is not None:
            keep_tagged.add(entries[-1])
        for e, s in tagged:
            if (e, s) not in keep_tagged:
                shutil.rmtree(os.path.join(self.directory, _ckpt_name(e, s)))

        epochs = self._epochs()
        if len(epochs) <= self.limit_num:
            return
        margin = len(epochs) - self.limit_num
        for e in epochs[:margin]:
            if (e + 1) % self.save_interval != 0:
                shutil.rmtree(os.path.join(self.directory, _ckpt_name(e)))

    # -- restore ------------------------------------------------------------
    def latest_epoch(self) -> Optional[int]:
        """Epoch index of the most recent checkpoint (epoch-end or tagged)."""
        entries = self._entries()
        return entries[-1][0] if entries else None

    def latest_path(self) -> Optional[str]:
        entries = self._entries()
        if not entries:
            return None
        e, s = entries[-1]
        return os.path.join(self.directory, _ckpt_name(e, s))

    def restore(self, target, epoch: Optional[int] = None):
        """Full state restore (resume_from_checkpoint parity). With `epoch`,
        restores that epoch's most recent save; otherwise the newest overall
        (which may be a mid-epoch step-tagged save — the trainer's resume
        logic replays the unseen tail from `state.step`)."""
        _check_layout_sidecar(self.directory)
        entries = self._entries()
        if epoch is not None:
            entries = [x for x in entries if x[0] == epoch]
        if not entries:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        e, s = entries[-1]
        path = os.path.join(self.directory, _ckpt_name(e, s))
        return self._ckptr.restore(path, target=target)


_LAYOUT_SIDECAR = "optimizer_layout.json"


def _write_layout_sidecar(directory: str):
    """Record which optimizer-state pytree layout (nested vs MEDIMG_FLAT_OPT
    flat vectors) this run's checkpoints carry, so a restore under the other
    layout fails with an actionable message instead of an opaque Orbax
    structure mismatch (ADVICE r4, train/state.py:make_optimizer)."""
    import json

    from ..train.state import optimizer_layout

    try:
        with open(os.path.join(directory, _LAYOUT_SIDECAR), "w") as f:
            json.dump({"optimizer_layout": optimizer_layout()}, f)
    except OSError:
        pass  # sidecar is best-effort; never block a save


def _check_layout_sidecar(directory: str):
    import json

    from ..train.state import optimizer_layout

    p = os.path.join(directory, _LAYOUT_SIDECAR)
    if not os.path.exists(p):
        return  # pre-round-5 checkpoint dirs carry no sidecar
    try:
        with open(p) as f:
            saved = json.load(f).get("optimizer_layout")
    except (OSError, ValueError):
        return
    now = optimizer_layout()
    if saved and saved != now:
        raise ValueError(
            f"checkpoint at {directory} was written with optimizer_layout="
            f"'{saved}' but this process would restore with '{now}' "
            f"(MEDIMG_FLAT_OPT={'1' if now == 'flat' else '0'}). The "
            "optimizer-state pytrees are incompatible; set MEDIMG_FLAT_OPT="
            f"{'1' if saved == 'flat' else '0'} to match the checkpoint."
        )


def restore_state(ckpt_dir_or_path: str, target_state, epoch: Optional[int] = None):
    """Full-state restore accepting either a checkpoint parent directory or a
    specific `ckpt-epoch=NNNN[-step=M]` subdirectory — the same affordance
    `restore_fields` gives the staged-load paths."""
    path = ckpt_dir_or_path
    if _CKPT_RE.search(os.path.basename(os.path.normpath(path))):
        _check_layout_sidecar(os.path.dirname(os.path.abspath(path)))
        return ocp.StandardCheckpointer().restore(
            os.path.abspath(path), target=target_state
        )
    if not os.path.isdir(path):
        raise FileNotFoundError(f"checkpoint directory does not exist: {path}")
    return CheckpointManager(path).restore(target_state, epoch=epoch)


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
        if epoch is not None:
            path = os.path.join(mgr.directory, _ckpt_name(epoch))
        else:
            path = mgr.latest_path()
            if path is None:
                raise FileNotFoundError(f"no checkpoints in {ckpt_dir_or_path}")
    ckptr = ocp.StandardCheckpointer()
    full = ckptr.restore(os.path.abspath(path), target=target_state)
    updates = {f: getattr(full, f) for f in fields}
    return target_state.replace(**updates)
