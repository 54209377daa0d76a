"""`python -m hexhamming_ray.job` — the ray-job-submit entrypoint.

Runs in-process against the already-initialized test Ray session (the
entrypoint must NOT own the session when one exists — same contract as
running inside a submitted Ray job, where the client is pre-connected).
"""

import json
import os
import shutil

import pytest

CORPUS = "/tmp/hexray_test_corpus"
OUT = "/tmp/hexray_test_job_out"


@pytest.fixture(scope="module")
def job_corpus(ray_session):
    from hexhamming_ray.sources.synth import generate_corpus

    return generate_corpus(CORPUS, n_files=400, seed=42)


def test_job_entry_runs_and_writes_lineage(job_corpus, capsys):
    import ray

    from hexhamming_ray.job import main

    shutil.rmtree(OUT, ignore_errors=True)
    rc = main(["--input", job_corpus, "--out", OUT])
    assert rc == 0
    assert ray.is_initialized()  # did not shut down the session it didn't own

    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["status"] == "ok"
    assert summary["rows"]["clusters"] == 400

    with open(os.path.join(OUT, "manifest.json")) as f:
        manifest = json.load(f)
    for stage in ("fingerprints", "edges", "clusters"):
        entry = manifest[stage]
        assert entry["complete"]
        assert entry["wall_sec"] > 0
        # per-partition lineage: every Parquet part with its row count
        assert sum(p["rows"] for p in entry["partitions"]) == entry["rows"]
    assert os.path.exists(os.path.join(OUT, "metrics.parquet"))


def test_job_entry_resumes(job_corpus, capsys):
    """Second submit with the same --out skips completed stages (stage
    Parquet untouched) and reports identical row counts."""
    from hexhamming_ray.job import main

    fp_dir = os.path.join(OUT, "fingerprints")
    before = {f: os.path.getmtime(os.path.join(fp_dir, f))
              for f in os.listdir(fp_dir)}
    rc = main(["--input", job_corpus, "--out", OUT])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows"]["clusters"] == 400
    after = {f: os.path.getmtime(os.path.join(fp_dir, f))
             for f in os.listdir(fp_dir)}
    assert before == after


def test_job_entry_update_mode(job_corpus, capsys, tmp_path):
    """--update merges a new-files directory into the checkpointed run
    and the merged clusters equal a from-scratch run over the combined
    corpus (the incremental-ER job surface)."""
    import pandas as pd
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from hexhamming_ray.job import main
    from hexhamming_ray.sources.synth import generate_corpus

    # fresh corpus split 80/20 by row hash of path
    import hashlib as _hl

    full_dir = generate_corpus("/tmp/hexray_test_corpus_upd", n_files=300,
                               seed=7)
    full = pads.dataset(full_dir).to_table()
    import pyarrow as pa

    is_new = pa.array(
        [int(_hl.md5(p.encode()).hexdigest(), 16) % 5 == 0
         for p in full.column("path").to_pylist()]
    )
    old_dir = str(tmp_path / "old"); os.makedirs(old_dir)
    new_dir = str(tmp_path / "new"); os.makedirs(new_dir)
    pq.write_table(full.filter(pa.compute.invert(is_new)),
                   os.path.join(old_dir, "part-0.parquet"))
    pq.write_table(full.filter(is_new),
                   os.path.join(new_dir, "part-0.parquet"))

    out = str(tmp_path / "ck")
    assert main(["--input", old_dir, "--out", out]) == 0
    assert main(["--input", old_dir, "--out", out, "--update", new_dir]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["mode"] == "update"
    assert summary["rows"] == len(full)

    merged = pads.dataset(summary["out"]).to_table().to_pandas().sort_values(
        "file_id").reset_index(drop=True)
    truth_out = str(tmp_path / "truth")
    assert main(["--input", full_dir, "--out", truth_out]) == 0
    capsys.readouterr()
    truth = pads.dataset(os.path.join(truth_out, "clusters")).to_table(
    ).to_pandas().sort_values("file_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(merged, truth)
