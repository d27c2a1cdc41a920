"""Self-contained checkpoints: params + batch_stats + config, top-k managed.

The reference leans on Lightning's ``ModelCheckpoint`` (monitor ``val/loss``,
``save_top_k=3``, ``save_last=True``) and embeds hyperparameters in the ckpt
so ``load_from_checkpoint`` can rebuild the model from the file alone
(reference: ``src/train.py:491-498``, ``src/eval.py:510``). This module is
the Orbax equivalent: every checkpoint directory bundles the resolved config
JSON next to the model variables, and :func:`load_checkpoint` reconstructs
``(model, variables, config)`` with no external state.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..utils.config import ConfigNode


def _is_primary() -> bool:
    """True on the process that owns filesystem mutations (rank 0)."""
    return jax.process_index() == 0


def _sync(name: str) -> None:
    """Cross-process barrier; no-op single-process.

    Multi-host checkpointing orders rank-0's directory mutations before the
    all-rank orbax saves (validated by a REAL 2-process CPU rendezvous in
    ``tests/test_multiprocess.py`` — unsynchronised rmtree/mkdir raced
    orbax's commit and lost files mid-save)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def _host_tree(tree: Any) -> Any:
    """Fetch a pytree to host numpy, tolerating multi-process shardings.

    Replicated leaves fetch directly; leaves sharded across PROCESSES (ZeRO
    moments, pipeline layer stacks) are not addressable from any single
    process, so they all-gather first. Collective: every process must call
    this (they all do — checkpoint saves are collective in orbax too)."""

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree_util.tree_map(fetch, tree)


def _save_variables(path: Path, variables: Dict[str, Any]) -> None:
    with ocp.PyTreeCheckpointer() as checkpointer:
        checkpointer.save(path.resolve() / "variables", variables, force=True)


def _restore_variables(path: Path) -> Dict[str, Any]:
    with ocp.PyTreeCheckpointer() as checkpointer:
        return checkpointer.restore((path / "variables").resolve())


class CheckpointManager:
    """Top-k checkpointing keyed on a monitored metric (lower is better)."""

    def __init__(
        self,
        directory: str | Path,
        config: Optional[ConfigNode] = None,
        save_top_k: int = 3,
        save_last: bool = True,
        adopt_existing: bool = True,
    ):
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.config = config
        self.save_top_k = save_top_k
        self.save_last = save_last
        self._entries: List[Tuple[float, Path]] = []  # (score, path)
        # adopt checkpoints already on disk (mid-run resume): top-k tracking
        # and best_model_path must span the whole run, not just this process.
        # A FRESH run into a reused save_dir must NOT adopt (a previous run's
        # better checkpoint would silently win best_model_path/test metrics)
        # — the Trainer passes adopt_existing only under resume_from.
        if adopt_existing:
            for existing in sorted(self.directory.glob("epoch=*-val_loss=*")):
                try:
                    score = float(existing.name.rsplit("val_loss=", 1)[1])
                except ValueError:
                    continue
                self._entries.append((score, existing))

    @property
    def best_model_path(self) -> Optional[str]:
        if not self._entries:
            return None
        return str(min(self._entries, key=lambda e: e[0])[1])

    @property
    def best_model_score(self) -> Optional[float]:
        if not self._entries:
            return None
        return float(min(self._entries, key=lambda e: e[0])[0])

    @property
    def best_model_epoch(self) -> Optional[int]:
        """Epoch of the best entry (parsed from ``epoch=N-val_loss=...``);
        lets a resumed run restore its early-stopping patience counter."""
        if not self._entries:
            return None
        path = min(self._entries, key=lambda e: e[0])[1]
        try:
            return int(path.name.split("epoch=", 1)[1].split("-", 1)[0])
        except (IndexError, ValueError):
            return None

    def _write(
        self,
        path: Path,
        host_vars: Dict[str, Any],
        meta: Dict[str, Any],
        host_state: Any = None,
    ) -> None:
        """Write one checkpoint directory from HOST numpy trees.

        Multi-host notes: ``save_dir`` must be a filesystem shared by every
        process (rank 0 writes, all ranks restore — the standard pod setup;
        host-local paths would leave non-zero ranks unable to restore the
        best checkpoint for the end-of-fit test eval). The host-numpy
        design means process-sharded state (ZeRO moments, pipe layers) is
        all-gathered once per ``save`` — simple and exactly what restore
        needs on ANY later topology, at the cost of one full-state host
        copy per epoch; at pod scale where that matters, orbax's native
        sharded-jax.Array writes are the upgrade path."""
        # rank 0 owns the directory lifecycle; the barrier keeps other ranks
        # from entering orbax's coordinated save while the dir is mid-rmtree
        if _is_primary():
            if path.exists():
                shutil.rmtree(path)
            path.mkdir(parents=True, exist_ok=True)
        _sync("msfa_ckpt_dir_ready")
        _save_variables(path, host_vars)
        if host_state is not None:
            with ocp.PyTreeCheckpointer() as checkpointer:
                checkpointer.save(
                    path.resolve() / "train_state", host_state, force=True
                )
        if _is_primary():
            payload = dict(meta)
            if self.config is not None:
                payload["config"] = self.config.to_container(resolve=True)
            (path / "meta.json").write_text(json.dumps(payload, indent=2))
        # a non-primary rank may restore this checkpoint right after save
        # (end-of-fit test eval) — don't let it race rank-0's meta.json
        _sync("msfa_ckpt_done")

    def save(
        self,
        variables: Dict[str, Any],
        epoch: int,
        score: float,
        extra_meta: Optional[Dict[str, Any]] = None,
        train_state: Any = None,
    ) -> Optional[str]:
        """Save if within top-k; also refresh ``last`` (which additionally
        carries the full optimizer/PRNG train state for mid-run resume).
        Returns the saved top-k path, if any."""
        meta = {"epoch": int(epoch), "val_loss": float(score)}
        if extra_meta:
            meta.update(extra_meta)
        saved_path: Optional[str] = None

        # host-fetch ONCE per save (collective: every rank participates) —
        # the top-k and "last" writes below share these trees instead of
        # re-gathering per write (was 3 param-tree gathers per epoch)
        host_vars = _host_tree(variables)
        host_state = _host_tree(train_state) if train_state is not None else None

        if self.save_top_k != 0:
            name = f"epoch={epoch}-val_loss={score:.4f}"
            path = self.directory / name
            worst = max(self._entries, key=lambda e: e[0])[0] if self._entries else None
            if (
                self.save_top_k < 0
                or len(self._entries) < self.save_top_k
                or (worst is not None and score < worst)
            ):
                self._write(path, host_vars, meta)
                self._entries.append((float(score), path))
                saved_path = str(path)
                while self.save_top_k > 0 and len(self._entries) > self.save_top_k:
                    worst_entry = max(self._entries, key=lambda e: e[0])
                    self._entries.remove(worst_entry)
                    # bookkeeping runs on every rank (scores come from
                    # replicated metrics, so the lists agree); only rank 0
                    # touches the filesystem
                    if _is_primary() and worst_entry[1].exists():
                        shutil.rmtree(worst_entry[1])

        if self.save_last:
            self._write(self.directory / "last", host_vars, meta, host_state)
        return saved_path


def load_train_state(path: str | Path, target: Any = None):
    """Restore the full train state saved with a ``last`` checkpoint."""
    path = Path(path)
    state_dir = (path / "train_state").resolve()
    if not state_dir.exists():
        raise FileNotFoundError(f"No train_state in checkpoint: {path}")
    with ocp.PyTreeCheckpointer() as checkpointer:
        if target is not None:
            return checkpointer.restore(state_dir, item=target)
        return checkpointer.restore(state_dir)


def load_checkpoint(path: str | Path):
    """Restore ``(variables, config)`` from a checkpoint directory.

    The returned config is a :class:`ConfigNode` rebuilt from the bundled
    resolved JSON — enough to reconstruct the model via
    ``MultimodalFusionModel.from_config`` (reference's
    ``load_from_checkpoint`` contract, ``src/eval.py:510-515``).
    """
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"Checkpoint not found: {path}")
    variables = _restore_variables(path)
    meta_path = path / "meta.json"
    config = None
    meta: Dict[str, Any] = {}
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
        if "config" in meta:
            config = ConfigNode(meta["config"])
    return variables, config, meta
