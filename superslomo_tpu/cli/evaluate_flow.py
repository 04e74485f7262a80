"""Optical-flow EPE evaluation CLI (reference:
scripts/evaluate_optical_flow_results.py:10-13, :31-77).

    python -m superslomo_tpu.cli.evaluate_flow -c eval.ini --log epe.log
"""

from __future__ import annotations

import json
import logging
from argparse import ArgumentParser


def main():
    parser = ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--log", required=True)
    parser.add_argument("--max-samples", type=int, default=None)
    args = parser.parse_args()
    logging.basicConfig(filename=args.log, level=logging.INFO)

    from superslomo_tpu.cli.common import load_model_params
    from superslomo_tpu.config import load_config
    from superslomo_tpu.eval.evaluate_flow import evaluate_flow

    cfg = load_config(args.config)
    params = load_model_params(cfg)
    results = evaluate_flow(cfg, params, max_samples=args.max_samples)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
