"""Command-line entry points — the ``ray job submit`` surface.

    # run (or resume) the partitioned KG job over a parquet corpus
    python -m saber_ray.cli run --input 'corpus/*.parquet' --out /data/kg

    # generate a synthetic interleaved corpus
    python -m saber_ray.cli synth --docs 100000 --out /data/corpus

    # evaluate emitted triples against a gold table
    python -m saber_ray.cli eval --pred /data/kg/triples --gold /data/gold \
        --metrics /data/kg/metrics.json

On a cluster each subcommand is submitted as-is::

    ray job submit --working-dir . -- python -m saber_ray.cli run ...

Scripts own the Ray session (``ray.init`` guarded); library code never
initialises Ray.
"""

from __future__ import annotations

import argparse
import json
import os


def _ensure_ray() -> None:
    import ray

    if not ray.is_initialized():
        # RAY_ADDRESS targets a running cluster (the ray job submit path);
        # unset -> start a local instance ("auto" would raise instead)
        ray.init(
            address=os.environ.get("RAY_ADDRESS") or None,
            include_dashboard=False,
            logging_level="ERROR",
            ignore_reinit_error=True,
        )


def cmd_run(args: argparse.Namespace) -> None:
    _ensure_ray()
    from .pipelines.kg import KGConfig
    from .pipelines.run import run_kg_job

    if args.config:
        # INI base + CLI overrides (the reference's config harmonization)
        from .config import load_config

        overrides = {}
        if args.num_salts is not None:
            overrides["num_salts"] = args.num_salts
        if args.batch_size is not None:
            overrides["batch_size"] = args.batch_size
        if args.bundle:
            overrides["bundle_path"] = args.bundle
        if args.dedup is not None:
            overrides["dedup"] = args.dedup
        if args.dedup_min_jaccard is not None:
            overrides["dedup_min_jaccard"] = args.dedup_min_jaccard
        if args.dedup_edit_k is not None:
            overrides["dedup_edit_k"] = args.dedup_edit_k
        config = load_config(args.config, **overrides)
    else:
        config = KGConfig(
            num_salts=args.num_salts if args.num_salts is not None else 16,
            batch_size=args.batch_size if args.batch_size is not None else 256,
            bundle_path=args.bundle,
            dedup=args.dedup or "",
            dedup_min_jaccard=(
                args.dedup_min_jaccard if args.dedup_min_jaccard is not None else 0.8
            ),
            dedup_edit_k=(
                args.dedup_edit_k if args.dedup_edit_k is not None else 2
            ),
        )
    summary = run_kg_job(
        args.input, args.out, config, partitions=args.partitions
    )
    print(json.dumps(summary))


def cmd_train(args: argparse.Namespace) -> None:
    """Train a tagger over CoNLL dataset folder(s) (reference:
    python -m saber.cli.train --dataset_folder ..., saber/cli/train.py:
    1-30): train/valid/test prefixes select the strategy exactly like
    the reference Trainer. ``--model bilstm`` trains the full recurrent
    stack by gradient descent; MULTIPLE --dataset_folder values train a
    shared encoder with per-dataset CRF heads (the reference's compound
    datasets, saber/utils/data_utils.py:94-116)."""
    _ensure_ray()
    from .sources.conll import read_conll_partitions

    folders = args.dataset_folder
    all_parts = []
    for folder in folders:
        parts = read_conll_partitions(folder)
        if "train" not in parts:
            raise FileNotFoundError(f"no train.* file in {folder}")
        all_parts.append(parts)

    if args.model == "perceptron":
        if len(folders) > 1:
            raise SystemExit("--model perceptron supports one dataset "
                             "folder; use --model bilstm for compound")
        from .pipelines.train import TrainConfig, Trainer

        parts = all_parts[0]
        trainer = Trainer(
            parts["train"], valid=parts.get("valid"), test=parts.get("test"),
            config=TrainConfig(epochs=args.epochs, k_folds=args.k_folds,
                               shards=args.shards),
        )
        result = trainer.train()
        if args.out:
            trainer.save(args.out)
            result["bundle"] = args.out
    else:
        from .pipelines.train import (
            MultiTaskRecurrentTrainer,
            RecurrentTrainConfig,
            RecurrentTrainer,
        )

        cfg = RecurrentTrainConfig(epochs=args.epochs, shards=args.shards,
                                   k_folds=args.k_folds)
        if len(folders) == 1:
            parts = all_parts[0]
            trainer = RecurrentTrainer(
                parts["train"], valid=parts.get("valid"),
                test=parts.get("test"), config=cfg)
            result = trainer.train()
            if args.out:
                trainer.save(args.out)
                result["bundle"] = args.out
        else:
            mt = MultiTaskRecurrentTrainer(
                [{"train": p["train"], "valid": p.get("valid")}
                 for p in all_parts],
                config=cfg,
            )
            result = mt.train()
            if args.out:
                bundles = []
                for i in range(len(folders)):
                    bundles.append(mt.save(i, f"{args.out}-task{i}"))
                result["bundles"] = bundles
    print(json.dumps(result))


def cmd_synth(args: argparse.Namespace) -> None:
    _ensure_ray()
    from .sources.synthetic import synthetic_dataset

    ds = synthetic_dataset(args.docs, seed=args.seed)
    ds.write_parquet(args.out)
    print(json.dumps({"docs": args.docs, "out": args.out}))


def cmd_eval(args: argparse.Namespace) -> None:
    _ensure_ray()
    import ray.data as rd

    from .sources.sinks import write_metrics_json
    from .stages.evaluate import evaluate_triples

    scores = evaluate_triples(rd.read_parquet(args.pred), rd.read_parquet(args.gold))
    p, r, f1, support = scores["MICRO_AVG"]
    if args.metrics:
        write_metrics_json(scores, args.metrics)
    print(json.dumps({"precision": p, "recall": r, "f1": f1, "support": support}))


def cmd_curate(args: argparse.Namespace) -> None:
    """Training-data curation over a parquet corpus: quality gate →
    duplicated-span cutting → exact dedup of the cleaned text →
    (optional) temperature mixture over a stratum column → partitioned
    parquet out. Every stage is the library operator the query contract
    value-checks; this is the one-command composition."""
    _ensure_ray()
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data as rd

    from .stages.dedup import cut_spans, dedup_exact, duplicate_spans
    from .stages.quality import quality_filter_batch
    from .stages.relational import lookup_join, semi_join
    from .stages.sampling import temperature_mixture

    docs = rd.read_parquet(args.input)

    def keep_ids(b: pa.Table) -> pa.Table:
        v = quality_filter_batch(b, min_tokens=args.min_tokens)
        return v.filter(v["keep"]).select(["doc_id"])

    kept = semi_join(
        docs, docs.map_batches(keep_ids, batch_format="pyarrow"),
        "doc_id", "doc_id",
    ).materialize()
    n_kept = kept.count()
    clean = cut_spans(kept, duplicate_spans(kept, k=args.span_k)).materialize()
    survivors = dedup_exact(clean, column="clean_text").select_columns(["doc_id"])
    out = semi_join(clean, survivors, "doc_id", "doc_id")
    if args.mixture_by:
        from .functions.partitioning import shuffle_partitions

        # out is shuffle-derived lineage consumed three times below
        # (stratum attach, semi-join probe, semi-join itself) — pin it
        out = out.materialize()
        # bucketed lookup_join, not the native hash join: a partition
        # with zero rows from one side loses its schema and breaks the
        # key FieldRef (guaranteed once fan-out exceeds survivor count)
        n_parts = shuffle_partitions(2, kept)
        with_src = lookup_join(
            out.select_columns(["doc_id"]),
            kept.select_columns(["doc_id", args.mixture_by]),
            "doc_id", "doc_id",
            payload=[args.mixture_by], num_partitions=n_parts,
        )
        picked = temperature_mixture(
            with_src, args.mixture_by, alpha=args.alpha,
            total=args.mixture_total,
        ).select_columns(["doc_id"])
        out = semi_join(out, picked, "doc_id", "doc_id")
    out.write_parquet(args.out)
    n_out = rd.read_parquet(args.out).count()
    print(json.dumps({
        "input_docs": docs.count(), "quality_kept": n_kept,
        "written": n_out, "out": args.out,
    }))


def cmd_serve(args: argparse.Namespace) -> None:
    # in-process annotator; no Ray session needed for the serving path
    from .service import serve

    server = serve(host=args.host, port=args.port)
    print(json.dumps({"serving": f"http://{args.host}:{server.server_address[1]}"}),
          flush=True)
    server.serve_forever()


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="saber_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="run/resume the partitioned KG job")
    p_run.add_argument("--input", required=True, help="parquet glob of documents")
    p_run.add_argument("--out", required=True)
    p_run.add_argument("--partitions", type=int, default=8)
    p_run.add_argument("--config", default="", help="INI config file (CLI flags override)")
    def _positive(v):
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError("must be >= 1")
        return n

    p_run.add_argument("--num-salts", type=_positive, default=None)
    p_run.add_argument("--batch-size", type=int, default=None)
    p_run.add_argument("--bundle", default="", help="model bundle dir → neural tagger path")
    p_run.add_argument("--dedup", choices=["", "exact", "minhash", "edit"], default=None,
                       help="checkpointed dedup stage between annotate and graph")
    p_run.add_argument("--dedup-min-jaccard", type=float, default=None,
                       help="near-dup verification threshold (minhash)")
    p_run.add_argument("--dedup-edit-k", type=int, default=None,
                       help="Levenshtein radius (edit dedup)")
    p_run.set_defaults(fn=cmd_run)

    p_train = sub.add_parser("train", help="train the tagger on a CoNLL folder")
    p_train.add_argument("--dataset-folder", dest="dataset_folder",
                         required=True, nargs="+",
                         help="dir(s) with train.*/valid.*/test.* CoNLL TSVs; "
                              "multiple dirs + --model bilstm = compound "
                              "multi-task training (shared encoder)")
    p_train.add_argument("--model", choices=("perceptron", "bilstm"),
                         default="perceptron",
                         help="perceptron = distributed linear CRF; bilstm = "
                              "gradient-trained recurrent stack")
    p_train.add_argument("--epochs", type=int, default=5)
    p_train.add_argument("--k-folds", type=int, default=5)
    p_train.add_argument("--shards", type=int, default=8)
    p_train.add_argument("--out", default="", help="write the trained bundle here")
    p_train.set_defaults(fn=cmd_train)

    p_synth = sub.add_parser("synth", help="generate a synthetic corpus")
    p_synth.add_argument("--docs", type=int, required=True)
    p_synth.add_argument("--seed", type=int, default=42)
    p_synth.add_argument("--out", required=True)
    p_synth.set_defaults(fn=cmd_synth)

    p_eval = sub.add_parser("eval", help="triple-level P/R vs a gold table")
    p_eval.add_argument("--pred", required=True)
    p_eval.add_argument("--gold", required=True)
    p_eval.add_argument("--metrics", default="")
    p_eval.set_defaults(fn=cmd_eval)

    p_curate = sub.add_parser(
        "curate", help="quality gate -> span cut -> dedup -> mixture -> parquet"
    )
    p_curate.add_argument("--input", required=True, help="parquet glob of documents")
    p_curate.add_argument("--out", required=True)
    p_curate.add_argument("--min-tokens", type=int, default=10)
    p_curate.add_argument("--span-k", type=int, default=8,
                          help="duplicated-substring window (tokens)")
    p_curate.add_argument("--mixture-by", default="",
                          help="stratum column for temperature rebalancing")
    p_curate.add_argument("--alpha", type=float, default=0.5)
    p_curate.add_argument("--mixture-total", type=int, default=100000)
    p_curate.set_defaults(fn=cmd_curate)

    p_serve = sub.add_parser("serve", help="annotation HTTP service")
    p_serve.add_argument("--host", default="127.0.0.1")
    p_serve.add_argument("--port", type=int, default=8421)
    p_serve.set_defaults(fn=cmd_serve)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
