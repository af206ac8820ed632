"""CLI entry points — the engine's ``ray job submit`` surface (replacing the
reference's Flask REST wrapper, /root/reference/Duke/DukeRestListener.py,
which reloaded the embedding model per request; here a job owns one Ray
session and side assets are built once).

    python -m duke_ray.cli describe --input <csv|parquet> [--columns a,b]
    python -m duke_ray.cli kg --sf-dir /root/testdata/sf0.001 --out /tmp/kg
    python -m duke_ray.cli evaluate --input <csv|parquet> --positives p.json
    python -m duke_ray.cli query --name pricing_summary --sf-dir /data/sf1 \
        [--out /data/out] [--list]
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="duke_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("describe", help="dataset summarization (Duke parity)")
    d.add_argument("--input", required=True)
    d.add_argument("--columns", default=None)
    d.add_argument("--top-n", type=int, default=10)
    d.add_argument("--row-agg", default="mean")
    d.add_argument("--tree-agg", default="mean+max")
    d.add_argument("--source-agg", default="mean")

    k = sub.add_parser("kg", help="knowledge-graph construction")
    k.add_argument("--sf-dir", required=True)
    k.add_argument("--out", required=True)
    k.add_argument("--replicas", type=int, default=1)
    k.add_argument("--buckets", type=int, default=16)

    e = sub.add_parser("evaluate", help="labeled config-grid evaluation")
    e.add_argument("--input", required=True)
    e.add_argument("--positives", required=True)
    e.add_argument("--out-dir", default="/tmp/duke_ray_trials")
    e.add_argument("--run-id", default="run")

    qp = sub.add_parser("query", help="run any registered pipeline by name")
    qp.add_argument("--name", default=None, help="queries() key; omit with --list")
    qp.add_argument("--sf-dir", default=None)
    qp.add_argument("--out", default=None, help="write result parquet here instead of printing a sample")
    qp.add_argument("--list", action="store_true", help="list available query names")

    args = p.parse_args(argv)
    _init_ray(args.num_cpus)
    import ray

    try:
        if args.cmd == "describe":
            from .pipelines.summarize import summarize_dataset
            from .sources.tables import read_tabular

            cols = args.columns.split(",") if args.columns else None
            res = summarize_dataset(
                read_tabular(args.input), columns=cols,
                row_agg=args.row_agg, tree_agg=args.tree_agg, source_agg=args.source_agg,
            )
            words, scores = res.top_n_words(args.top_n)
            print(json.dumps({
                "description": res.description(),
                "top_words": words,
                "scores": scores,
                "sources": res.source_names,
            }))
        elif args.cmd == "kg":
            from .pipelines.kg import run_kg_pipeline

            metrics = run_kg_pipeline(args.sf_dir, args.out, replicas=args.replicas,
                                      n_buckets=args.buckets)
            print(json.dumps({"n_nodes": metrics["n_nodes"], "n_edges": metrics["n_edges"],
                              "out": args.out}))
        elif args.cmd == "evaluate":
            from .pipelines.evaluate import load_positive_examples, run_labeled_trials, write_trial_csv
            from .sources.tables import read_tabular

            trials = run_labeled_trials(read_tabular(args.input),
                                        load_positive_examples(args.positives))
            path = write_trial_csv(trials, args.out_dir, args.run_id)
            best = trials.iloc[0]
            print(json.dumps({"trials_csv": path, "best_config": best["config"],
                              "best_gap": float(best["score_gap"])}))
        elif args.cmd == "query":
            # the driver-contract registry doubles as the job catalog: every
            # pipeline a user can gate-check is also submittable as a job
            import importlib.util
            import os

            spec = importlib.util.spec_from_file_location(
                "duke_ray_entry",
                os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             "__ray_entry__.py"),
            )
            entry = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(entry)
            qs = entry.queries()
            if args.list or not args.name:
                print(json.dumps({"queries": sorted(qs)}))
            else:
                if args.name not in qs:
                    raise SystemExit(f"unknown query {args.name!r}; try --list")
                if not args.sf_dir:
                    raise SystemExit("--sf-dir is required with --name")
                res = qs[args.name](args.sf_dir)
                import pandas as pd
                import pyarrow as pa

                import ray.data as rd

                if isinstance(res, rd.Dataset):
                    if args.out:
                        res.write_parquet(args.out)
                        print(json.dumps({"name": args.name, "out": args.out,
                                          "rows": res.count()}))
                    else:
                        n = res.count()
                        print(json.dumps({"name": args.name, "rows": n,
                                          "sample": res.take(5)}, default=str))
                else:
                    df = res.to_pandas() if isinstance(res, pa.Table) else res
                    if args.out:
                        os.makedirs(args.out, exist_ok=True)
                        path = os.path.join(args.out, "part-0.parquet")
                        df.to_parquet(path)
                        print(json.dumps({"name": args.name, "out": args.out,
                                          "rows": len(df)}))
                    else:
                        print(json.dumps({"name": args.name, "rows": len(df),
                                          "sample": df.head(5).to_dict("records")},
                                         default=str))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
