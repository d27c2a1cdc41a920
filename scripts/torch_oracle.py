#!/usr/bin/env python
"""Torch training oracle on the SAME 27-shard PAMAP2 splits (verdict ask #2).

The committed accuracy rows (0.757±0.051 hybrid headline, +3.6% fusion
margin, LSTM 0.416) sit far below the reference's full-data expectations
(0.80-0.85 hybrid, +25-30% margin, reference README.md:203-207 /
report.typ:164). The report blames the surviving 27/88-shard subset — this
script tests that claim by training a PyTorch re-implementation of the
reference architecture (torch.nn.LSTM / nn.TransformerEncoder encoders +
pairwise cross-modal attention + adaptive gated fusion, mirroring
reference src/encoders.py:16-208, src/fusion.py:248-479, src/train.py:125-430)
on the exact same materialised windows our pipeline produces.

Two recipes:

- ``reference``: the reference's own training recipe on this subset —
  chunk 1024 non-overlapping windows, no normalisation, AdamW 1e-3 / wd 1e-4,
  cosine, clip 1.0, label smoothing 0.05, modality dropout 0.1 (the only
  augmentation the reference implements — jitter/noise are config-only),
  10 epochs, best-val-loss checkpoint. The reference trains batch_size=1
  chunks with gradient_accumulation=4 (src/train.py:511-524); here that
  identical effective gradient is computed as batch=4 without accumulation
  (no BatchNorm anywhere, so the math is the same) for CPU efficiency.
- ``matched``: our flagship windowing (chunk 512, stride 128, instance
  normalisation, dropout 0.2, modality dropout 0.2, gaussian noise 0.1,
  batch 32) so the run is directly comparable to the committed
  ``experiments/encoder_lstm`` row (0.416).

Usage:
    python scripts/torch_oracle.py --jobs ref_hybrid_lstm:42 ... [--epochs 10]
    python scripts/torch_oracle.py --all   # the full 12-job oracle matrix
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

import numpy as np
import torch
import torch.nn as nn

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.data.dataset import (  # noqa: E402
    create_datasets,
)

OUT_DIR = REPO_ROOT / "experiments" / "torch_oracle"
MODALITIES = ["imu_hand", "imu_chest", "imu_ankle", "heart_rate"]
NUM_CLASSES = 25
HIDDEN, OUTPUT, HEADS = 256, 128, 4


# ---------------------------------------------------------------------------
# model (fresh torch implementation of the reference architecture)
# ---------------------------------------------------------------------------

class SeqEncoder(nn.Module):
    """LSTM (last hidden state) or 1-layer transformer (masked mean-pool) +
    dropout + linear projection — reference src/encoders.py:16-208."""

    def __init__(self, input_dim, encoder_type="lstm", dropout=0.1):
        super().__init__()
        self.encoder_type = encoder_type
        if encoder_type == "lstm":
            self.rnn = nn.LSTM(input_dim, HIDDEN, num_layers=1, batch_first=True)
        elif encoder_type == "transformer":
            self.input_projection = nn.Linear(input_dim, HIDDEN)
            layer = nn.TransformerEncoderLayer(
                d_model=HIDDEN, nhead=4, dropout=dropout, batch_first=True
            )
            self.transformer = nn.TransformerEncoder(layer, num_layers=1)
        else:
            raise ValueError(encoder_type)
        self.drop = nn.Dropout(dropout)
        self.projection = nn.Linear(HIDDEN, OUTPUT)

    def forward(self, x, lengths=None):  # [B, T, D] -> [B, OUTPUT]
        if self.encoder_type == "lstm":
            if lengths is not None:
                packed = nn.utils.rnn.pack_padded_sequence(
                    x, lengths, batch_first=True, enforce_sorted=False
                )
                _, (h_n, _) = self.rnn(packed)
            else:
                _, (h_n, _) = self.rnn(x)
            pooled = h_n[-1]
        else:
            h = self.input_projection(x)
            if lengths is not None:
                t = torch.arange(x.shape[1]).unsqueeze(0)
                pad = t >= torch.as_tensor(lengths).unsqueeze(1)
                out = self.transformer(h, src_key_padding_mask=pad)
                valid = (~pad).unsqueeze(-1).float()
                pooled = (out * valid).sum(1) / valid.sum(1).clamp_min(1.0)
            else:
                pooled = self.transformer(h).mean(dim=1)
        return self.projection(self.drop(pooled))


class CrossModalAttention(nn.Module):
    """Multi-head scaled-dot attention on pooled (length-1) embeddings —
    reference src/attention.py:16-146 at q_len=k_len=1."""

    def __init__(self, dim, num_heads, dropout):
        super().__init__()
        self.q = nn.Linear(dim, dim)
        self.k = nn.Linear(dim, dim)
        self.v = nn.Linear(dim, dim)
        self.out = nn.Linear(dim, dim)
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.drop = nn.Dropout(dropout)

    def forward(self, query, key):  # [B, H] x2 -> [B, H]
        B = query.shape[0]
        q = self.q(query).view(B, self.num_heads, self.head_dim)
        k = self.k(key).view(B, self.num_heads, self.head_dim)
        v = self.v(key).view(B, self.num_heads, self.head_dim)
        # q_len = k_len = 1: the softmax over a single key is identically 1,
        # so attended = v (the reference computes the same thing the long way)
        del q, k
        attended = v.reshape(B, -1)
        return self.out(self.drop(attended))


class HybridFusion(nn.Module):
    """Pairwise cross-modal attention + adaptive gated weighting —
    reference src/fusion.py:248-479."""

    def __init__(self, names, dropout):
        super().__init__()
        self.names = list(names)
        self.projections = nn.ModuleDict(
            {n: nn.Linear(OUTPUT, HIDDEN) for n in self.names}
        )
        self.pairs = [
            (qi, ki)
            for qi in range(len(self.names))
            for ki in range(len(self.names))
            if qi != ki
        ]
        self.pair_attn = nn.ModuleList(
            [CrossModalAttention(HIDDEN, HEADS, dropout) for _ in self.pairs]
        )
        self.gates = nn.ModuleDict({n: nn.Linear(HIDDEN, 1) for n in self.names})
        self.classifier_hidden = nn.Linear(HIDDEN, HIDDEN)
        self.classifier_out = nn.Linear(HIDDEN, NUM_CLASSES)
        self.drop = nn.Dropout(dropout)

    def forward(self, feats, mask):  # feats {n: [B, OUTPUT]}, mask [B, M]
        names = self.names
        projected = [
            self.drop(torch.relu(self.projections[n](self.drop(
                feats[n] * mask[:, i: i + 1]
            ))))
            for i, n in enumerate(names)
        ]
        per_query = {qi: [projected[qi]] for qi in range(len(names))}
        for (qi, ki), attn in zip(self.pairs, self.pair_attn):
            per_query[qi].append(attn(projected[qi], projected[ki]))
        aggregated = [
            torch.stack(per_query[qi], 0).mean(0) * mask[:, qi: qi + 1]
            for qi in range(len(names))
        ]
        # adaptive gates: masked softmax + renormalise, uniform fallback
        scores = torch.cat(
            [self.gates[n](aggregated[i]) for i, n in enumerate(names)], dim=1
        )
        scores = scores.masked_fill(mask <= 0, float("-inf"))
        weights = torch.softmax(scores, dim=1)
        weights = torch.nan_to_num(weights) * mask
        total = weights.sum(1, keepdim=True)
        msum = mask.sum(1, keepdim=True)
        prop = torch.where(msum > 0, mask / msum.clamp_min(1e-12),
                           torch.full_like(mask, 1.0 / len(names)))
        weights = torch.where(total > 0, weights / total.clamp_min(1e-12), prop)
        fused = (torch.stack(aggregated, 1) * weights.unsqueeze(-1)).sum(1)
        h = self.drop(torch.relu(self.classifier_hidden(fused)))
        return self.classifier_out(h)


class OracleModel(nn.Module):
    def __init__(self, modalities, dims, encoder_type, dropout):
        super().__init__()
        self.modalities = list(modalities)
        self.encoders = nn.ModuleDict(
            {m: SeqEncoder(dims[m], encoder_type, dropout) for m in self.modalities}
        )
        self.norms = nn.ModuleDict(
            {m: nn.LayerNorm(OUTPUT) for m in self.modalities}
        )
        self.fusion = HybridFusion(self.modalities, dropout)

    def forward(self, features, mask, lengths=None):
        encoded = {
            m: self.norms[m](self.encoders[m](features[m], lengths))
            for m in self.modalities
        }
        return self.fusion(encoded, mask)


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def run_job(job, seed, epochs, out_dir):
    recipe, encoder_type, modalities = job
    torch.manual_seed(seed)
    np.random.seed(seed)
    torch.set_num_threads(max(1, torch.get_num_threads()))

    if recipe == "reference":
        kwargs = dict(chunk_size=1024, window_stride=None, normalize=False)
        batch, dropout, mod_drop, noise = 4, 0.1, 0.1, 0.0
    else:  # matched: our flagship windowing
        kwargs = dict(chunk_size=512, window_stride=128, normalize="instance")
        batch, dropout, mod_drop, noise = 32, 0.2, 0.2, 0.1
    train_w, val_w, test_w = create_datasets(
        dataset_name="pamap2", data_dir=str(REPO_ROOT / "data" / "pamap2"),
        modalities=modalities,
        chunk_cache_dir=str(REPO_ROOT / "data" / "pamap2" / "splits" / "cache"),
        **kwargs,
    )
    dims = {m: train_w.features[m].shape[-1] for m in modalities}
    model = OracleModel(modalities, dims, encoder_type, dropout)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=1e-4)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=epochs)
    criterion = nn.CrossEntropyLoss(label_smoothing=0.05)
    rng = np.random.default_rng(seed)

    def tensors(split, idx):
        feats = {
            m: torch.from_numpy(split.features[m][idx]) for m in modalities
        }
        labels = torch.from_numpy(split.labels[idx].astype(np.int64))
        lengths = torch.from_numpy(split.lengths[idx].astype(np.int64))
        return feats, labels, lengths

    def eval_split(split):
        model.eval()
        n = split.num_windows
        preds = np.empty(n, np.int64)
        losses = []
        with torch.no_grad():
            for s in range(0, n, 16):
                idx = np.arange(s, min(s + 16, n))
                feats, labels, lengths = tensors(split, idx)
                mask = torch.ones(len(idx), len(modalities))
                logits = model(feats, mask, lengths)
                losses.append(
                    nn.functional.cross_entropy(logits, labels, reduction="sum")
                    .item()
                )
                preds[idx] = logits.argmax(-1).numpy()
        acc = float((preds == split.labels).mean())
        # macro F1 over classes present in labels or predictions
        f1s = []
        for c in np.unique(np.concatenate([split.labels, preds])):
            tp = float(((preds == c) & (split.labels == c)).sum())
            fp = float(((preds == c) & (split.labels != c)).sum())
            fn = float(((preds != c) & (split.labels == c)).sum())
            f1s.append(2 * tp / (2 * tp + fp + fn) if (2 * tp + fp + fn) else 0.0)
        return acc, float(np.mean(f1s)), float(np.sum(losses) / n)

    n = train_w.num_windows
    best_val, best_state = float("inf"), None
    history = []
    t0 = time.time()
    for epoch in range(epochs):
        model.train()
        order = rng.permutation(n)
        total_loss = 0.0
        for s in range(0, n, batch):
            idx = order[s: s + batch]
            feats, labels, lengths = tensors(train_w, idx)
            if noise > 0:
                feats = {m: f + noise * torch.randn_like(f) for m, f in feats.items()}
            mask = torch.ones(len(idx), len(modalities))
            if mod_drop > 0 and len(modalities) > 1:
                keep = torch.from_numpy(
                    (rng.random((len(idx), len(modalities))) > mod_drop)
                    .astype(np.float32)
                )
                dead = keep.sum(1) == 0
                if dead.any():  # never drop every modality
                    keep[dead, rng.integers(0, len(modalities))] = 1.0
                mask = mask * keep
            opt.zero_grad()
            loss = criterion(model(feats, mask, lengths), labels)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
            opt.step()
            total_loss += loss.item() * len(idx)
        sched.step()
        val_acc, _, val_loss = eval_split(val_w)
        history.append(
            {"epoch": epoch, "train_loss": total_loss / n,
             "val_loss": val_loss, "val_acc": val_acc}
        )
        print(f"    epoch {epoch}: train {total_loss / n:.4f} "
              f"val {val_loss:.4f} acc {val_acc:.4f}", flush=True)
        if val_loss < best_val:
            best_val = val_loss
            best_state = {k: v.detach().clone() for k, v in model.state_dict().items()}
    if best_state is not None:
        model.load_state_dict(best_state)
    test_acc, test_f1, test_loss = eval_split(test_w)
    return {
        "recipe": recipe,
        "encoder_type": encoder_type,
        "modalities": modalities,
        "seed": seed,
        "epochs": epochs,
        "num_train_windows": int(n),
        "num_test_windows": int(test_w.num_windows),
        "best_val_loss": best_val,
        "test_accuracy": test_acc,
        "test_f1_macro": test_f1,
        "test_loss": test_loss,
        "wall_s": round(time.time() - t0, 1),
        "history": history,
    }


JOBS = {
    # reference recipe: the reference's own defaults on this subset
    "ref_hybrid_lstm": ("reference", "lstm", MODALITIES),
    "ref_hybrid_transformer": ("reference", "transformer", MODALITIES),
    "ref_single_imu_chest": ("reference", "lstm", ["imu_chest"]),
    # matched recipe: directly comparable to experiments/encoder_lstm (0.416)
    "matched_hybrid_lstm": ("matched", "lstm", MODALITIES),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--jobs", nargs="*", default=None,
                        help="job:seed entries, e.g. ref_hybrid_lstm:42")
    parser.add_argument("--all", action="store_true")
    parser.add_argument("--epochs", type=int, default=10)
    args = parser.parse_args()

    if args.all:
        entries = [f"{j}:{s}" for j in JOBS for s in (42, 43, 44)]
    else:
        entries = args.jobs or []
    if not entries:
        parser.error("give --jobs job:seed ... or --all")

    OUT_DIR.mkdir(parents=True, exist_ok=True)
    for entry in entries:
        name, seed = entry.rsplit(":", 1)
        out = OUT_DIR / f"{name}_s{seed}.json"
        print(f"== {name} seed {seed} ==", flush=True)
        result = run_job(JOBS[name], int(seed), args.epochs, OUT_DIR)
        out.write_text(json.dumps(result, indent=2))
        print(f"  -> test_acc={result['test_accuracy']:.4f} "
              f"f1={result['test_f1_macro']:.4f} ({result['wall_s']}s)", flush=True)

    # summary over everything on disk
    summary = {}
    for f in sorted(OUT_DIR.glob("*.json")):
        if f.name == "summary.json":
            continue
        r = json.loads(f.read_text())
        summary.setdefault(f.stem.rsplit("_s", 1)[0], []).append(
            {"seed": r["seed"], "test_accuracy": r["test_accuracy"],
             "test_f1_macro": r["test_f1_macro"]}
        )
    agg = {}
    for k, rows in summary.items():
        accs = [r["test_accuracy"] for r in rows]
        agg[k] = {
            "seeds": sorted(r["seed"] for r in rows),
            "accs": accs,
            "mean": float(np.mean(accs)),
            "std": float(np.std(accs, ddof=1)) if len(accs) > 1 else 0.0,
        }
    (OUT_DIR / "summary.json").write_text(json.dumps(agg, indent=2))
    print(json.dumps(agg, indent=2))


if __name__ == "__main__":
    main()
