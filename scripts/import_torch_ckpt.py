"""Import a trained PyTorch reference checkpoint into gaot_tpu.

    python scripts/import_torch_ckpt.py <config.json> <reference_ckpt.pt> [out]

Builds the trainer (and model) from the gaot_tpu config, loads the reference
``.pt`` checkpoint (saved by the reference as ``{"model": state_dict}``,
src/core/trainer_utils.py:23-48), maps the weights through
gaot_tpu.utils.torch_interop, and writes a gaot_tpu Orbax checkpoint to
``out`` (default: the config's path.ckpt_path). The mapping is strict — a
config mismatch raises instead of silently importing a partial model.

The dataset referenced by the config must be present: model channel counts
are derived from it, exactly as in training.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(config_path: str, ckpt_path: str, out: str = None) -> None:
    import torch

    from gaot_tpu.core.config import GAOTConfig, load_config_file, merge_config
    from gaot_tpu.train import SequentialTrainer, StaticTrainer
    from gaot_tpu.train.checkpoint import save_checkpoint
    from gaot_tpu.utils.torch_interop import torch_to_flax_params

    cfg = merge_config(GAOTConfig, load_config_file(config_path))
    cfg.setup.train = False   # build model + data shapes only
    trainer_cls = {"static": StaticTrainer,
                   "sequential": SequentialTrainer}[cfg.setup.trainer_name]
    trainer = trainer_cls(cfg)

    raw = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    sd = raw.get("model", raw)
    params = torch_to_flax_params(sd, trainer.params)

    out = out or cfg.path.ckpt_path
    save_checkpoint(out, params)
    n = sum(int(p.size) for p in __import__("jax").tree.leaves(params))
    print(f"Imported {len(sd)} tensors ({n} params) from {ckpt_path} "
          f"into {out}")


if __name__ == "__main__":
    if not 3 <= len(sys.argv) <= 4:
        print(__doc__)
        sys.exit(1)
    main(*sys.argv[1:])
