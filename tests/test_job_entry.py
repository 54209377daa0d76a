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
