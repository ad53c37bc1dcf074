"""Command-line entry point.

Equivalent of the reference main.py (main.py:19-198): load one or many
JSON/TOML experiment configs, run the configured trainer (static or
sequential), and append a result row to the experiment CSV database.

Multi-config runs execute as subprocesses (one TPU job at a time by default
— a single host owns the chip; raise --jobs for CPU runs/sweeps).
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time
from typing import Dict

import numpy as np


def _make_datarow(raw: Dict, config_path: str) -> Dict:
    """Flat experiment-database row (reference main.py:69-95)."""
    row = {
        "config": config_path,
        "time": time.strftime("%Y-%m-%d %H:%M:%S", time.localtime()),
        "nparams": -1,
        "nbytes": -1,
        "training time": np.nan,
        "samples_per_sec": np.nan,
        "relative error (direct)": np.nan,
        "relative error (auto2)": np.nan,
        "relative error (auto4)": np.nan,
    }
    for section in ("setup", "model", "dataset", "optimizer"):
        row[section] = repr(raw.get(section, {}))
    return row


def _append_csv(database_path: str, row: Dict) -> None:
    import pandas as pd

    os.makedirs(os.path.dirname(database_path) or ".", exist_ok=True)
    if os.path.exists(database_path):
        db = pd.read_csv(database_path)
        for col in row:
            if col not in db.columns:
                db[col] = np.nan
    else:
        db = pd.DataFrame(columns=list(row.keys()))
    db.loc[len(db)] = row
    db.to_csv(database_path, index=False)


def run_config(config_path: str) -> None:
    from .core.config import load_config_file, merge_config, GAOTConfig
    from .train import StaticTrainer, SequentialTrainer

    raw = load_config_file(config_path)
    cfg = merge_config(GAOTConfig, raw)
    # Resolve relative output paths against the config file location.
    base = os.path.dirname(os.path.abspath(config_path))
    for attr in ("ckpt_path", "loss_path", "result_path", "database_path"):
        p = getattr(cfg.path, attr)
        if not os.path.isabs(p):
            setattr(cfg.path, attr, os.path.join(base, p))

    datarow = _make_datarow(raw, config_path)
    trainer_cls = {"static": StaticTrainer,
                   "sequential": SequentialTrainer}[cfg.setup.trainer_name]
    trainer = trainer_cls(cfg, datarow=datarow)

    if cfg.setup.train:
        if cfg.setup.ckpt:
            trainer.load_ckpt()
        if cfg.setup.profile_dir:
            import jax

            with jax.profiler.trace(cfg.setup.profile_dir):
                trainer.fit()
        else:
            trainer.fit()
    if cfg.setup.test:
        trainer.load_ckpt()
        trainer.test()

    import jax

    if jax.process_index() == 0:
        _append_csv(cfg.path.database_path, datarow)


def _collect_configs(folder: str):
    paths = []
    for root, _, files in os.walk(folder):
        for name in sorted(files):
            if name.endswith((".json", ".toml")):
                paths.append(os.path.join(root, name))
    return paths


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="gaot_tpu experiment runner")
    parser.add_argument("-c", "--config", type=str, default=None,
                        help="config file path")
    parser.add_argument("-f", "--folder", type=str, default=None,
                        help="folder of config files")
    parser.add_argument("--debug", action="store_true",
                        help="run multi-config jobs in-process, serially")
    parser.add_argument("--jobs", type=int, default=1,
                        help="concurrent subprocesses for multi-config runs")
    args = parser.parse_args(argv)
    if not (args.config or args.folder):
        parser.error("specify --config or --folder")

    config_paths = [args.config] if args.config else _collect_configs(args.folder)
    if len(config_paths) == 1 or args.debug:
        for path in config_paths:
            run_config(path)
        return 0

    # Subprocess pool: `--jobs` at a time (reference main.py:132-173 round-
    # robins over CUDA devices; a TPU host owns one chip, so default is 1).
    pending = list(config_paths)
    failures = 0
    while pending:
        chunk, pending = pending[:args.jobs], pending[args.jobs:]
        procs = [subprocess.Popen([sys.executable, "-m", "gaot_tpu.cli", "-c", p])
                 for p in chunk]
        for p, path in zip(procs, chunk):
            if p.wait() != 0:
                print(f"Job {path} failed with code {p.returncode}", file=sys.stderr)
                failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
