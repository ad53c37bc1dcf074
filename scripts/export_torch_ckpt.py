"""Export a gaot_tpu Orbax checkpoint as a PyTorch-reference ``.pt`` file.

    python scripts/export_torch_ckpt.py <config.json> [ckpt_dir] [out.pt]

Inverse of scripts/import_torch_ckpt.py: builds the model from the gaot_tpu
config, restores the Orbax checkpoint (default: the config's
path.ckpt_path), maps the Flax params to the reference ``model.state_dict()``
layout (gaot_tpu.utils.torch_interop, strict), and saves
``{"model": state_dict}`` — loadable by the reference's load_ckpt
(src/core/trainer_utils.py:50-92).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(config_path: str, ckpt_dir: str = None, out: str = None) -> None:
    import torch

    from gaot_tpu.core.config import GAOTConfig, load_config_file, merge_config
    from gaot_tpu.train import SequentialTrainer, StaticTrainer
    from gaot_tpu.train.checkpoint import restore_checkpoint
    from gaot_tpu.utils.torch_interop import flax_to_torch_state_dict

    cfg = merge_config(GAOTConfig, load_config_file(config_path))
    cfg.setup.train = False
    trainer_cls = {"static": StaticTrainer,
                   "sequential": SequentialTrainer}[cfg.setup.trainer_name]
    trainer = trainer_cls(cfg)

    ckpt_dir = ckpt_dir or cfg.path.ckpt_path
    params = restore_checkpoint(ckpt_dir, trainer.params)["params"]
    sd = {k: torch.tensor(v)
          for k, v in flax_to_torch_state_dict(params).items()}

    out = out or os.path.join(os.path.dirname(ckpt_dir) or ".", "model.pt")
    torch.save({"model": sd}, out)
    print(f"Exported {len(sd)} tensors from {ckpt_dir} to {out}")


if __name__ == "__main__":
    if not 2 <= len(sys.argv) <= 4:
        print(__doc__)
        sys.exit(1)
    main(*sys.argv[1:])
