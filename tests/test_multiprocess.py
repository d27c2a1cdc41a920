"""REAL multi-process rendezvous: two OS processes, one jax.distributed job.

Upgrades the multi-host story from injection-tested plumbing to an actually
exercised cross-process run: both ranks initialise ``jax.distributed`` via
``parallel.coordinator_address``, build one 8-device global mesh (4 local
CPU devices each), and run the full ``Trainer.fit`` — whole-epoch scans over
the process-spanning mesh, replicated-metric eval, coordinated orbax
checkpointing (rank-0 filesystem ownership + barriers), rank-0-only
results.json/tensorboard. Reference anchor: the reference's only scale-out
was a CI job matrix (``.github/workflows/parallel_run.yml``); SURVEY §5 made
a real distributed backend the rebuild's replacement story.

Bugs this test caught during bring-up (all fixed in train/):
- batch-sharded eval logits are not addressable from any single process
  (np.asarray raised) -> eval_fn now replicates its output on-device;
- both ranks raced rmtree/mkdir/meta.json around orbax's coordinated save
  -> rank-0-only filesystem mutations with cross-process barriers;
- per-rank results.json / tensorboard writers stomped each other.
"""

from __future__ import annotations

import json
import math
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent

WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.utils.config import load_config
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.dataset import create_datasets
from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.trainer import Trainer

cfg = load_config({repo!r} + "/config/base.yaml", [
    "dataset.name=synthetic", "dataset.modalities=[s1,s2]",
    "dataset.num_classes=4", "dataset.num_samples=96",
    "dataset.sequence_length=16", "dataset.batch_size=16",
    "model.fusion_type=early", "model.output_dim=8",
    "model.layer_norm=false",
    {model_overrides}
    "training.max_epochs=2", "training.scheduler=none",
    "training.dropout_rng=xla",
    "experiment.name=mh", "experiment.save_dir={save_dir!r}",
    "parallel.num_devices=auto",
    {parallel_overrides}
    "parallel.coordinator_address=localhost:{port}",
    "parallel.num_processes=2", "parallel.process_id={rank}",
    "seed=7",
])
train_w, val_w, test_w = create_datasets(
    dataset_name="synthetic", data_dir="./data", modalities=["s1", "s2"],
    num_classes=4, num_samples=96, sequence_length=16, seed=7,
)
trainer = Trainer(cfg)
import jax
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
results = trainer.fit(train_w, val_w, test_w)
print("RANK{rank}_RESULT", results["best_val_loss"], results["test_acc"], flush=True)
"""

CNN_MODEL = (
    '"model.hidden_dim=16", '
    '"model.encoders={s1: {type: sequence, encoder_type: cnn, num_layers: 1}, '
    's2: {type: sequence, encoder_type: cnn, num_layers: 1}}",'
)
# tensor-parallel leg: transformer FFW weights shard over a "model" axis that
# SPANS the two processes, and ZeRO-1 moments shard over the process-spanning
# "data" axis — checkpointing must process_allgather them (train/checkpoint.py
# _host_tree), the path the dp leg never touches
TP_MODEL = (
    '"model.hidden_dim=32", '
    '"model.encoders={s1: {type: sequence, encoder_type: transformer, '
    "num_layers: 1, flash_attention: false, fused_mlp: false, "
    "fused_mlp_ln: false}, s2: {type: sequence, encoder_type: transformer, "
    "num_layers: 1, flash_attention: false, fused_mlp: false, "
    'fused_mlp_ln: false}}",'
)
TP_PARALLEL = (
    '"parallel.model_parallel=2", "parallel.zero_optimizer=true", '
    '"parallel.sequence_parallel=true",'
)
# GPipe leg: the layer stack shards over a "pipe" axis that spans the two
# processes — stage-to-stage ppermute activations ride the cross-process
# transport inside the shard_map'd schedule
PP_MODEL = TP_MODEL.replace("num_layers: 1", "num_layers: 2")
PP_PARALLEL = '"parallel.pipeline_parallel=2",'


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_two_ranks(tmp_path, model_overrides, parallel_overrides):
    port = _free_port()
    save_dir = str(tmp_path / "runs")
    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    # stdout goes to FILES, not PIPEs: a rank whose 64KB pipe fills while
    # the other is being read blocks inside a collective and stalls the
    # whole job into the timeout instead of surfacing the real error
    log_paths = [tmp_path / f"rank{r}.log" for r in (0, 1)]
    logs = [open(p, "w") for p in log_paths]
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", "-c",
             WORKER.format(repo=str(REPO_ROOT), save_dir=save_dir,
                           port=port, rank=rank,
                           model_overrides=model_overrides,
                           parallel_overrides=parallel_overrides)],
            stdout=log, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(REPO_ROOT),
        )
        for rank, log in zip((0, 1), logs)
    ]
    try:
        for p in procs:
            p.wait(timeout=420)
    except subprocess.TimeoutExpired:
        for q in procs:
            q.kill()
        raise
    finally:
        for log in logs:
            log.close()
    outs = [p.read_text() for p in log_paths]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    # both ranks computed the identical replicated metrics
    vals = []
    for rank, out in enumerate(outs):
        line = [ln for ln in out.splitlines() if f"RANK{rank}_RESULT" in ln]
        assert line, out[-2000:]
        _, loss, acc = line[0].rsplit(" ", 2)
        vals.append((float(loss), float(acc)))
    assert all(math.isfinite(v) for pair in vals for v in pair), vals
    assert abs(vals[0][0] - vals[1][0]) < 1e-4
    assert abs(vals[0][1] - vals[1][1]) < 1e-6
    return Path(save_dir) / "mh"


def test_two_process_rendezvous_trains(tmp_path):
    run_dir = _run_two_ranks(tmp_path, CNN_MODEL, "")

    # rank 0 wrote exactly one results.json + checkpoints; restore works
    results = json.loads((run_dir / "results.json").read_text())
    assert results["best_model_path"]
    ckpts = list((run_dir / "checkpoints").glob("epoch=*-val_loss=*"))
    assert ckpts, list((run_dir / "checkpoints").iterdir())
    assert (run_dir / "checkpoints" / "last" / "train_state").exists()
    # meta.json written once, by rank 0, and parseable
    meta = json.loads((ckpts[0] / "meta.json").read_text())
    assert meta["epoch"] >= 0

    # cross-topology restore: the checkpoint a 2-process pod run wrote is
    # host-numpy, so THIS single-process test runner can rebuild the model
    # from it alone (the same self-containedness contract as the reference's
    # load_from_checkpoint)
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.train.checkpoint import (
        load_checkpoint,
    )

    variables, cfg, meta2 = load_checkpoint(results["best_model_path"])
    assert "params" in variables
    assert cfg is not None
    assert abs(meta2["val_loss"] - results["best_val_loss"]) < 1e-6


def test_two_process_tp_zero(tmp_path):
    """dp x tp mesh spanning both processes + ZeRO-1: the optimizer moments
    and Megatron FFW shards live across processes, so the checkpoint path
    must all-gather them (``_host_tree``); metrics still replicate."""
    run_dir = _run_two_ranks(tmp_path, TP_MODEL, TP_PARALLEL)
    assert (run_dir / "results.json").exists()
    assert (run_dir / "checkpoints" / "last" / "train_state").exists()


def test_two_process_pipeline(tmp_path):
    """dp x pp mesh spanning both processes: GPipe's stage-to-stage
    ppermute activations cross the process boundary, and the [L, ...]
    pipe_layers stacks are process-sharded at checkpoint time."""
    run_dir = _run_two_ranks(tmp_path, PP_MODEL, PP_PARALLEL)
    assert (run_dir / "results.json").exists()
    assert (run_dir / "checkpoints" / "last" / "train_state").exists()
