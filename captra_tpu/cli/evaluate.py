"""Offline evaluation entry point (reference misc/eval/eval.py __main__)."""
from __future__ import annotations

import argparse
from os.path import join as pjoin

from captra_tpu.cli.args import add_args, config_overrides
from captra_tpu.config import get_config
from captra_tpu.eval.evaluator import evaluate_results_dir


def main(argv=None):
    parser = add_args(argparse.ArgumentParser("captra-tpu eval"))
    parser.add_argument("--no_iou", action="store_true", default=False)
    args = parser.parse_args(argv)
    cfg = get_config(args.config, config_overrides(args), args.config_dir)
    results_dir = pjoin(cfg.experiment_dir, "results")
    evaluate_results_dir(results_dir, cfg.obj, eval_iou=not args.no_iou)


if __name__ == "__main__":
    main()
