"""Epoch-level train/eval loops.

Parity with the reference's `train_one_epoch` / `val_one_epoch`
(reference: training_utils.py:39-104,140-169): per-iteration cosine LR (the
schedule lives inside the optax chain), NaN-loss abort, metric logging, and
the 5-scoring recall table on the eval side.
"""

from __future__ import annotations

import math
import sys
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from blim_tpu.core.config import ModelConfig
from blim_tpu.data.collate import collate_train_batch
from blim_tpu.data.datasets import RetrievalDataset, TrainLoader
from blim_tpu.data.prompts import TVGLayout, VTGLayout
from blim_tpu.engine.evaluation import EvalInputs, evaluation
from blim_tpu.engine.rerank import RerankEngine
from blim_tpu.scoring import fusion
from blim_tpu.utils.logging import MetricLogger, SmoothedValue


def train_one_epoch(
    state,
    step_fn,
    frozen,
    dataset: RetrievalDataset,
    loader: TrainLoader,
    features: np.ndarray,
    video_vocab: jax.Array,
    tokenizer,
    vtg_layout: VTGLayout,
    tvg_layout: TVGLayout,
    epoch: int,
    rng: jax.Array,
    print_freq_div: int = 4,
    lr_fn=None,
):
    metric_logger = MetricLogger(delimiter="  ")
    metric_logger.add_meter("lr", SmoothedValue(window_size=1, fmt="{value:.6f}"))
    header = f"Epoch: [{epoch}]"
    n_batches = len(loader)
    print_freq = max(n_batches // print_freq_div, 1)

    for it, idx in enumerate(metric_logger.log_every(loader.batches(epoch), print_freq, header)):
        batch_np = collate_train_batch(
            [dataset.captions[i] for i in idx],
            features[dataset.item_video_idx[idx]],
            dataset.item_video_idx[idx],
            tokenizer,
            dataset.name,
            vtg_layout,
            tvg_layout,
        )
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        state, metrics = step_fn(state, frozen, batch, video_vocab, jax.random.fold_in(rng, it))
        loss = float(metrics["loss"])
        if not math.isfinite(loss):
            # reference aborts the whole run on NaN loss (training_utils.py:83-85)
            print(f"Loss is {loss}, stopping training")
            sys.exit(1)
        metric_logger.update(
            loss=loss,
            vtg_loss=float(metrics["vtg_loss"]),
            tvg_loss=float(metrics["tvg_loss"]),
            lr=lr_fn(epoch + it / max(n_batches, 1)) if lr_fn else 0.0,
        )

    metric_logger.synchronize_between_processes()
    print("Averaged stats:", metric_logger)
    return state, {k: m.global_avg for k, m in metric_logger.meters.items()}


def val_one_epoch(
    engine: RerankEngine,
    dataset: RetrievalDataset,
    iv2_scores: Dict[str, np.ndarray],
    tokenizer,
    topk: int,
    cpn: bool,
    alpha: Tuple[float, float],
    c: Tuple[float, float, float, float],
    has_tvg: bool,
) -> Dict[str, Dict[str, float]]:
    inputs = EvalInputs(
        captions=dataset.captions,
        item_video_idx=dataset.item_video_idx,
        features=dataset.load_features(),
        t2v_iv2=iv2_scores["t2v"],
        v2t_iv2=iv2_scores["v2t"],
    )
    t2v_dict, v2t_dict = evaluation(
        engine, inputs, tokenizer, dataset.name, topk=topk, cpn=cpn, has_tvg=has_tvg
    )
    n = len(dataset)
    ids = {i: i for i in range(n)}
    return fusion.all_scoring_results(
        t2v_dict, v2t_dict, ids, ids, alpha=alpha, c=c, cpn=cpn, has_tvg=has_tvg
    )


def results_table(results: Dict[str, Dict[str, float]]) -> str:
    """Pandas-style table like the reference's log.txt dump (main.py:170-194)."""
    try:
        import pandas as pd

        return pd.DataFrame(results).transpose().to_string()
    except ImportError:
        lines = []
        cols = list(next(iter(results.values())).keys())
        lines.append(" " * 26 + "  ".join(f"{c:>10}" for c in cols))
        for name, row in results.items():
            lines.append(f"{name:<26}" + "  ".join(f"{row[c]:>10.2f}" for c in cols))
        return "\n".join(lines)
