"""Evaluation harness: pairwise precision/recall/F1 of predicted
clusters against the generator's labeled pairs (north rule: pairwise
F1 >= 0.99 on labeled pairs per blocking key).

Driver-side pandas over the (small) labels table — this is an offline
metric computation, not a pipeline stage; the clusters themselves are
computed distributed."""

from __future__ import annotations

import pyarrow.parquet as pq


def pairwise_scores(clusters_ds, labels_path: str) -> dict:
    labels = pq.read_table(labels_path).to_pandas()
    cmap: dict[int, int] = {}
    for batch in clusters_ds.iter_batches(batch_format="pyarrow"):
        ids = batch.column("file_id").to_pylist()
        cids = batch.column("cluster_id").to_pylist()
        cmap.update(zip(ids, cids))
    lo = labels["id_lo"].map(cmap)
    hi = labels["id_hi"].map(cmap)
    pred = (lo == hi) & lo.notna()
    truth = labels["is_match"]
    tp = int((pred & truth).sum())
    fp = int((pred & ~truth).sum())
    fn = int((~pred & truth).sum())
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "n_labeled": len(labels),
    }
