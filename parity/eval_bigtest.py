#!/usr/bin/env python
"""Re-evaluate finished parity checkpoints on an ENLARGED test set.

The convergence-parity metric is the reference's torch-median (lower-middle)
of per-sample rel-L1 over a 16-sample test set — a single order statistic,
so ~1e-4-relative weight drift between two equivalently-trained models can
flip which sample is the median and move the metric by several 1e-3. This
tool appends extra TEST samples to a sequential case (the generator draws
samples in a per-sample rng loop and `norm_samples` pins normalization to
the original prefix, so samples 0..119 — and therefore both finished
training runs — are bit-identical), then evaluates BOTH sides' final
checkpoints on the larger test set with their own stacks.

Usage: python parity/eval_bigtest.py --case seq_time_der \
           [--workdir /tmp/parity] [--extra 48]
Writes <workdir>/bigtest_<case>.json.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parity import cases  # noqa: E402

# The original sample count is the generator's own default — read it from
# the signature so the prefix pinning can't silently diverge from cases.py.
import inspect  # noqa: E402

ORIG_SAMPLES = inspect.signature(
    cases.make_sequential_fx).parameters["num_samples"].default


def build_big_dataset(case, workdir, extra):
    data_dir = os.path.join(workdir, "data_big")
    os.makedirs(data_dir, exist_ok=True)
    nc = os.path.join(data_dir, f"{case}.nc")
    mk = cases.make_sequential_fx(nc, num_samples=ORIG_SAMPLES + extra,
                                  norm_samples=ORIG_SAMPLES)
    # Prefix bit-identity against the original dataset (if present).
    orig = os.path.join(workdir, "data", f"{case}.nc")
    if os.path.exists(orig):
        import h5py

        with h5py.File(orig, "r") as f0, h5py.File(nc, "r") as f1:
            u0, u1 = f0["u"][:], f1["u"][:ORIG_SAMPLES]
            assert u0.shape == u1.shape and np.array_equal(u0, u1), \
                "big dataset prefix diverged from the original"
        meta0 = json.load(open(orig[:-3] + ".meta.json"))
        assert np.allclose(meta0["global_std"], mk["global_std"]), \
            "pinned normalization diverged from the original metadata"
    return data_dir, mk


def big_config(case, data_dir, workdir, side, extra):
    cfg = cases.build_config(case, data_dir, workdir, side)
    cfg["dataset"]["test_size"] = cfg["dataset"]["test_size"] + extra
    return cfg


def register_meta(mk, case, registry, meta_cls):
    mk = dict(mk)
    mk["domain_x"] = tuple(map(tuple, mk["domain_x"]))
    if mk.get("domain_t") is not None:
        mk["domain_t"] = tuple(mk["domain_t"])
    registry[cases.metaname(case)] = meta_cls(**mk)


def eval_gaot(case, data_dir, workdir, extra):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gaot_jax_cache")

    from gaot_tpu.core.metadata import DATASET_METADATA, Metadata

    mk = json.load(open(os.path.join(data_dir, "meta.json")))
    register_meta(mk, case, DATASET_METADATA, Metadata)
    cfg = big_config(case, data_dir, workdir, "gaot", extra)
    from gaot_tpu.train import SequentialTrainer, StaticTrainer

    trainer_cls = {"static": StaticTrainer,
                   "sequential": SequentialTrainer}[cfg["setup"]["trainer_name"]]
    trainer = trainer_cls(cfg)
    trainer.load_ckpt()
    trainer.test()
    return {k: float(v) for k, v in trainer.datarow.items()
            if k.startswith("relative error") and v == v}


def eval_ref(case, data_dir, workdir, extra):
    import torch

    from parity import stubs

    torch.set_num_threads(1)
    stubs.install_all()

    from src.datasets.dataset import DATASET_METADATA, Metadata

    mk = json.load(open(os.path.join(data_dir, "meta.json")))
    register_meta(mk, case, DATASET_METADATA, Metadata)
    cfg = big_config(case, data_dir, workdir, "ref", extra)

    class _Arg:
        def __init__(self, c):
            for k, v in c.items():
                setattr(self, k, v)
            self.datarow = {}

    from src.trainer.sequential_trainer import SequentialTrainer
    from src.trainer.static_trainer import StaticTrainer

    trainer_cls = {"static": StaticTrainer,
                   "sequential": SequentialTrainer}[cfg["setup"]["trainer_name"]]
    trainer = trainer_cls(_Arg(cfg))
    ckpt = os.path.join(workdir, "ref", case, "ckpt", "model.pt")
    sd = torch.load(ckpt, weights_only=True, map_location="cpu")
    sd = sd.get("model", sd) if isinstance(sd, dict) else sd
    trainer.model.load_state_dict(sd, strict=True)
    trainer.test()
    return {k: float(v) for k, v in trainer.config.datarow.items()
            if k.startswith("relative error") and v == v}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--case", required=True,
                   choices=[c for c in cases.CASES if c.startswith("seq_")])
    p.add_argument("--workdir", default="/tmp/parity")
    p.add_argument("--extra", type=int, default=48)
    args = p.parse_args()

    data_dir, mk = build_big_dataset(args.case, args.workdir, args.extra)
    with open(os.path.join(data_dir, "meta.json"), "w") as f:
        json.dump(mk, f)

    ref_m = eval_ref(args.case, data_dir, args.workdir, args.extra)
    gaot_m = eval_gaot(args.case, data_dir, args.workdir, args.extra)

    out = {"case": args.case, "extra_test": args.extra,
           "test_size": cases.CASES[args.case]["dataset"]["test_size"]
           + args.extra,
           "reference": ref_m, "gaot_tpu": gaot_m,
           "gaps": {k: abs(ref_m[k] - gaot_m[k])
                    for k in ref_m if k in gaot_m}}
    print("BIGTEST_RESULT " + json.dumps(out))
    path = os.path.join(args.workdir, f"bigtest_{args.case}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
