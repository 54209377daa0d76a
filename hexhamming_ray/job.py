"""``ray job submit`` entrypoint for the flagship ER pipeline.

The north rule (BASELINE.json) asks for the pipeline to be runnable as
a Ray job on a fixed-size cluster::

    ray job submit --working-dir . -- \
        python -m hexhamming_ray.job \
            --input /data/files_parquet \
            --out   /data/er_out \
            --plan sort

Inside a submitted job the Ray client is already connected, so the
entrypoint only calls ``ray.init`` when run standalone (e.g. a local
smoke run). The run is resumable: stage outputs are checkpointed as
partitioned Parquet under ``--out`` with a per-partition lineage
manifest (``manifest.json``) and pipeline-level metrics
(``metrics.parquet``); a re-submitted job skips completed stages.

Exit contract: prints ONE JSON summary line on success (stage row
counts + manifest path) and exits non-zero on failure, so schedulers
can gate downstream steps on the job result.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m hexhamming_ray.job",
        description="Entity-resolution ER pipeline as a Ray job.",
    )
    ap.add_argument("--input", required=True,
                    help="Parquet directory of files(repo,path,commit,lang,content)")
    ap.add_argument("--out", required=True,
                    help="checkpoint + output root (stage Parquet, manifest.json, "
                         "metrics.parquet)")
    ap.add_argument("--threshold", type=int, default=None,
                    help="max simhash Hamming distance for a match edge")
    ap.add_argument("--plan", default="sort", choices=["sort", "hash"],
                    help="physical plan for the candidate shuffle")
    ap.add_argument("--no-resume", action="store_true",
                    help="ignore existing checkpoints and recompute every stage")
    ap.add_argument("--update", metavar="NEW_INPUT", default=None,
                    help="INCREMENTAL mode: merge the NEW files Parquet "
                         "directory into the completed run checkpointed "
                         "under --out (old content is never re-read; see "
                         "pipelines.er.update_clusters). Writes the merged "
                         "clusters to <out>/clusters_updated/ and prints "
                         "the summary line.")
    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)

    try:
        from hexhamming_ray.pipelines.er import DEFAULT_THRESHOLD, run_pipeline

        if args.update:
            from hexhamming_ray.pipelines.er import update_clusters

            new_files = ray.data.read_parquet(args.update)
            merged = update_clusters(
                args.out, new_files,
                threshold=args.threshold or DEFAULT_THRESHOLD,
            )
            dest = os.path.join(args.out, "clusters_updated")
            if os.path.isdir(dest):
                import shutil

                shutil.rmtree(dest)
            merged.write_parquet(dest)
            print(json.dumps({
                "status": "ok",
                "mode": "update",
                "out": dest,
                "rows": merged.count(),
            }))
            return 0

        if args.no_resume and os.path.isdir(args.out):
            import shutil

            shutil.rmtree(args.out)
        os.makedirs(args.out, exist_ok=True)
        res = run_pipeline(
            args.input,
            out_dir=args.out,
            threshold=args.threshold or DEFAULT_THRESHOLD,
            resume=True,
            plan=args.plan,
        )
        summary = {
            "status": "ok",
            "out": args.out,
            "manifest": os.path.join(args.out, "manifest.json"),
            "rows": {name: ds.count() for name, ds in res.items()},
        }
        print(json.dumps(summary))
        return 0
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
