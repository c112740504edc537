"""CLI — the reference's canonical entry point (``mdf run -c config.yaml``,
``cli.py:41-209``) re-expressed: parse YAML → compile → run → print the
funnel stats (``cli.py:104-150`` stats print).

Usage::

    python -m webscale_multimodal_datapipeline_spark.cli run -c examples/curate_documents.yaml \
        --sf-dir /root/testdata/sf0.001
    python -m webscale_multimodal_datapipeline_spark.cli explain -c ... --sf-dir ...
"""

from __future__ import annotations

import argparse
import sys
import time


def cmd_run(args: argparse.Namespace) -> int:
    from webscale_multimodal_datapipeline_spark.compiler import compile_pipeline
    from webscale_multimodal_datapipeline_spark.session import get_spark

    spark = get_spark("cli-run")
    pipe = compile_pipeline(open(args.config).read())
    t0 = time.time()
    result = pipe.run(spark, args.sf_dir)
    n_out = result.output.count()
    wall = time.time() - t0

    print(f"pipeline: {args.config}")
    metrics = result.metrics.harvest()
    n_in = metrics[0].input_records if metrics else n_out
    for m in metrics:
        bar = "#" * int(m.pass_rate * 30)
        print(
            f"  {m.stage_name:>12s} | {m.operator_name:<24s} "
            f"{m.input_records:>9d} -> {m.output_records:<9d} "
            f"({m.pass_rate:6.1%}) {bar}"
        )
    if result.rejected is not None and args.show_rejected:
        n_rej = result.rejected.count()
        print(f"  rejected: {n_rej} rows")
    print(
        f"  total: {n_in} -> {n_out} ({(n_out / n_in if n_in else 1.0):.1%}) "
        f"in {wall:.2f}s ({(n_in / wall if wall > 0 else 0):,.0f} rec/s)"
    )
    if args.metrics_dir:
        from webscale_multimodal_datapipeline_spark.metrics import write_metrics

        write_metrics(result.metrics, args.metrics_dir)
        print(f"  metrics -> {args.metrics_dir}/(operators|stages|runs)")
    return 0


def cmd_explain(args: argparse.Namespace) -> int:
    from webscale_multimodal_datapipeline_spark.compiler import compile_pipeline
    from webscale_multimodal_datapipeline_spark.session import get_spark

    spark = get_spark("cli-explain")
    pipe = compile_pipeline(open(args.config).read())
    result = pipe.run(spark, args.sf_dir, observe_metrics=False)
    result.output.explain("formatted")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="webscale_multimodal_datapipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in (("run", cmd_run), ("explain", cmd_explain)):
        sp = sub.add_parser(name)
        sp.add_argument("-c", "--config", required=True)
        sp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
        sp.add_argument("--metrics-dir", default=None)
        sp.add_argument("--show-rejected", action="store_true")
        sp.set_defaults(fn=fn)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
