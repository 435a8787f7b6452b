#!/usr/bin/env python3
"""CLI entry point (reference main.py:8-20)."""

from robust_cvd_tpu.config import parse_config
from robust_cvd_tpu.parallel.runtime import configure
from robust_cvd_tpu.pipeline.process import DatasetProcessor


def main(argv=None):
    configure()
    cfg = parse_config(argv)
    DatasetProcessor(cfg).process()


if __name__ == "__main__":
    main()
