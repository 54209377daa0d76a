"""Deterministic synthetic source-code corpus with planted clone clusters.

Produces the pipeline input shape from BASELINE.json ``input_hint``:
``files(repo: string, path: string, commit: string, lang: string,
content: string)`` as Parquet, plus a ``labeled_pairs`` oracle table the
pipeline never sees (FIXTURES.md §B planting rules).

Generation is itself a Ray Data pipeline (``ray.data.range(n_clusters)
.flat_map(...)``) so bench-scale corpora are built in parallel; the
labels pass regenerates only metadata (repo/path/commit are pure
functions of (cluster, clone index, seed)), so it never touches
content.

Everything derives from (seed, cluster_id, clone_idx) — no wall clock,
no global RNG state — so retried Ray tasks are value-identical
(SURVEY.md §4.2 determinism requirement).
"""

from __future__ import annotations

import hashlib
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from hexhamming_ray.functions.hashing import stable_id

LANGS = ["py", "js", "go", "java", "c"]
_KEYWORDS = {
    "py": ["def", "return", "import", "class", "for", "in", "if", "else", "None"],
    "js": ["function", "return", "const", "let", "for", "of", "if", "else", "null"],
    "go": ["func", "return", "package", "type", "for", "range", "if", "else", "nil"],
    "java": ["void", "return", "import", "class", "for", "int", "if", "else", "null"],
    "c": ["void", "return", "include", "struct", "for", "int", "if", "else", "NULL"],
}
_VOCAB_SIZE = 4000
HUB_EVERY = 97  # every 97th cluster is a skew hub
HUB_SIZE = 150
EMPTY_EVERY = 513  # every 513th cluster's first clone has empty content



def _tuned_range(n, **kw):
    import ray

    from hexhamming_ray import tune_data_context

    tune_data_context()
    return ray.data.range(n, **kw)


def _cluster_size(cluster_id: int) -> int:
    if cluster_id > 0 and cluster_id % HUB_EVERY == 0:
        return HUB_SIZE
    return 1 + (cluster_id * 2654435761) % 20


def _meta(cluster_id: int, clone_idx: int, seed: int) -> tuple[str, str, str, str]:
    """(repo, path, commit, lang) — pure function of identity, no content."""
    h = hashlib.sha256(f"meta|{seed}|{cluster_id}|{clone_idx}".encode()).hexdigest()
    org = int(h[:4], 16) % 500
    repo = f"org{org}/repo{int(h[4:8], 16) % 40}"
    lang = LANGS[cluster_id % len(LANGS)]
    path = f"src/mod_{h[8:16]}.{lang}"
    commit = h[24:64]  # 40 hex chars, sha1-shaped
    return repo, path, commit, lang


CONTENT_SCALE = 1  # bench knob: multiplies per-file token count


def _base_tokens(cluster_id: int, seed: int) -> list[str]:
    r = random.Random(f"base|{seed}|{cluster_id}")
    lang = LANGS[cluster_id % len(LANGS)]
    kw = _KEYWORDS[lang]
    # 400+ tokens: keeps the 1-2-edit clone simhash distance within the
    # scoring threshold (measured: 2 edits on 480-token docs -> p100 17
    # bits; shorter docs overshoot) — FIXTURES.md §B planting rule.
    # CONTENT_SCALE multiplies file size for scaling benchmarks (more
    # parallel compute per row; longer files only LOWER clone distances)
    n = r.randint(400, 900) * CONTENT_SCALE
    toks = []
    for _ in range(n):
        if r.random() < 0.25:
            toks.append(kw[r.randrange(len(kw))])
        else:
            toks.append(f"v{r.randrange(_VOCAB_SIZE)}")
    return toks


def _render(tokens: list[str]) -> str:
    lines = [" ".join(tokens[i : i + 8]) for i in range(0, len(tokens), 8)]
    return "\n".join(lines)


def make_cluster_rows(cluster_id: int, seed: int) -> list[dict]:
    """All file rows of one planted clone cluster."""
    size = _cluster_size(cluster_id)
    base = _base_tokens(cluster_id, seed)
    rows = []
    for clone_idx in range(size):
        repo, path, commit, lang = _meta(cluster_id, clone_idx, seed)
        if clone_idx == 0:
            if cluster_id % EMPTY_EVERY == EMPTY_EVERY - 1:
                content = ""
            else:
                content = _render(base)
        else:
            r = random.Random(f"edit|{seed}|{cluster_id}|{clone_idx}")
            toks = list(base)
            # m=0 -> exact duplicate; otherwise 1-2 token edits, which
            # keeps base->clone simhash distance comfortably inside the
            # scoring threshold (FIXTURES.md §B planting rule) — clones
            # link pairwise-or-transitively through the base
            m = 0 if r.random() < 0.12 else r.randint(1, 2)
            for _ in range(m):
                toks[r.randrange(len(toks))] = f"e{r.randrange(_VOCAB_SIZE)}"
            content = _render(toks)
        rows.append(
            {
                "repo": repo,
                "path": path,
                "commit": commit,
                "lang": lang,
                "content": content,
            }
        )
    return rows


def n_clusters_for(n_files: int) -> int:
    """Smallest cluster count whose cumulative size reaches n_files."""
    total = 0
    c = 0
    while total < n_files:
        total += _cluster_size(c)
        c += 1
    return c


def generate_corpus(
    out_dir: str, n_files: int, seed: int = 42, content_scale: int = 1
) -> str:
    """Write files/ Parquet via a parallel Ray Data pipeline. Idempotent:
    skips generation when the output manifest already matches."""
    import ray

    global CONTENT_SCALE
    CONTENT_SCALE = content_scale
    # parameter-keyed output dir: re-running with different knobs must
    # never mix parquet fragments in one directory
    tag = f"{n_files}_{seed}_{content_scale}"
    files_dir = os.path.join(out_dir, f"files_{tag}")
    marker = os.path.join(out_dir, f"_GENERATED_{tag}")
    if os.path.exists(marker):
        return files_dir
    nc = n_clusters_for(n_files)

    def expand(batch: dict) -> pa.Table:
        import hexhamming_ray.sources.synth as _synth

        _synth.CONTENT_SCALE = content_scale
        rows: list[dict] = []
        for cid in batch["id"].tolist():
            rows.extend(make_cluster_rows(int(cid), seed))
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("repo", pa.string()),
                    ("path", pa.string()),
                    ("commit", pa.string()),
                    ("lang", pa.string()),
                    ("content", pa.string()),
                ]
            ),
        )

    os.makedirs(files_dir, exist_ok=True)
    # row groups sized to ~4 MB of content: the fused read+fingerprint
    # source parallelizes over (file, row-group) units, so row-group
    # granularity IS the work-unit granularity — 20 MB groups quantize a
    # 32-CPU run into 2.5 waves with 20% tail stragglers
    rows_per_group = max(64, 2048 // max(1, content_scale))
    (
        _tuned_range(nc, override_num_blocks=max(8, nc // 64))
        .map_batches(expand, batch_format="numpy", batch_size=64)
        .write_parquet(files_dir, row_group_size=rows_per_group)
    )
    write_labels(labels_path(out_dir, n_files, seed, content_scale), n_files, seed)
    with open(marker, "w") as f:
        f.write("ok")
    return files_dir


def labels_path(out_dir: str, n_files: int, seed: int = 42,
                content_scale: int = 1) -> str:
    return os.path.join(
        out_dir, f"labeled_pairs_{n_files}_{seed}_{content_scale}.parquet"
    )


def write_labels(path: str, n_files: int, seed: int = 42) -> None:
    """Oracle labels: all intra-cluster pairs (is_match=True, excluding
    empty-content clusters) + deterministic cross-cluster negatives.
    Metadata-only — never reads content."""
    nc = n_clusters_for(n_files)
    lo, hi, match = [], [], []
    rep_ids = []
    for cid in range(nc):
        size = _cluster_size(cid)
        ids = sorted(
            stable_id(*_meta(cid, k, seed)[:3]) for k in range(size)
        )
        rep_ids.append(ids[0])
        if cid % EMPTY_EVERY == EMPTY_EVERY - 1:
            continue  # empty-content rep: near-dup semantics undefined
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                lo.append(ids[i])
                hi.append(ids[j])
                match.append(True)
    # negatives: consecutive cluster representatives (different bases)
    for cid in range(nc - 1):
        a, b = rep_ids[cid], rep_ids[cid + 1]
        lo.append(min(a, b))
        hi.append(max(a, b))
        match.append(False)
    t = pa.table(
        {
            "id_lo": pa.array(lo, type=pa.int64()),
            "id_hi": pa.array(hi, type=pa.int64()),
            "is_match": pa.array(match, type=pa.bool_()),
        }
    )
    pq.write_table(t, path)
