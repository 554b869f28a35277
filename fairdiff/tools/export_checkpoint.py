"""Checkpoint -> standalone adapter export, parity with the reference's
`2-export-checkpoint.py` (exp-1 version at :367-642: rebuild trainer state,
`accelerator.load_state(ckpt)`, save cpu state dicts
`{text_encoder_lora,unet_lora,prefix_embedding}[_EMA].pth` into
`<ckpt>_exported/`).

Here: restore the orbax train state and write flat .npz adapter trees
(loadable by gen_images / eval tools on any host, no framework state).

  python -m fairdiff.tools.export_checkpoint --experiment exp1 \
      --checkpoint_dir outputs/debias/checkpoints --tiny_smoke true
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax
import jax.numpy as jnp

from fairdiff.io.adapters_io import save_adapters
from fairdiff.utils import config as cfglib


@dataclasses.dataclass(frozen=True)
class ExportConfig:
    platform: str = ""  # jax backend override ("cpu" for virtual mesh)
    num_cpu_devices: int = 8
    experiment: str = "exp1"
    checkpoint_dir: str = "outputs/debias/checkpoints"
    step: int = -1  # -1 => latest
    output_dir: str = ""  # default <checkpoint_dir>/<step>_exported
    tiny_smoke: bool = False
    seed: int = 42
    # also write the reference's .pth layouts (text_encoder_lora[_EMA].pth,
    # unet_lora[_EMA].pth, prefix_embedding[_EMA].pth) so the adapters are
    # consumable by the reference's gen-images.py / diffusers loaders
    reference_format: bool = False


def main(cfg: ExportConfig) -> Path:
    cfglib.apply_platform(cfg.platform, cfg.num_cpu_devices)
    from fairdiff.tools.train_debias import TrainCLIConfig, build_trainer
    from fairdiff.training.checkpoints import DualCadenceCheckpointer

    # shapes only: never materialize the multi-GB frozen SD tree just to
    # derive the adapter template the restore needs
    _, trainer, _ = build_trainer(
        TrainCLIConfig(
            experiment=cfg.experiment, tiny_smoke=cfg.tiny_smoke, seed=cfg.seed
        ),
        abstract_params=True,
    )
    template = jax.eval_shape(trainer.init_state, jax.random.key(cfg.seed))
    template = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), template
    )
    ckpt = DualCadenceCheckpointer(cfg.checkpoint_dir)
    step = None if cfg.step < 0 else cfg.step
    state = ckpt.restore(template, step)

    out = Path(cfg.output_dir or f"{cfg.checkpoint_dir}/{state.step}_exported")
    wrap = lambda t: t if isinstance(t, dict) else {"prefix": t}
    for name, tree in state.adapters.items():
        save_adapters(out / f"{name}.npz", wrap(tree))
        save_adapters(out / f"{name}_EMA.npz", wrap(state.ema[name]))
    if cfg.reference_format:
        import numpy as np
        import torch

        from fairdiff.io import reference_adapters as ra

        savers = {
            "te_lora": ("text_encoder_lora", ra.save_reference_te_lora),
            "unet_lora": ("unet_lora", ra.save_reference_unet_lora),
            "prefix": (
                "prefix_embedding",
                lambda t: {"token_embedding.weight": np.asarray(t)},
            ),
        }
        for name, (ref_name, fn) in savers.items():
            if name not in state.adapters:
                continue
            for suffix, tree in (
                ("", state.adapters[name]), ("_EMA", state.ema[name])
            ):
                sd = {
                    k: torch.from_numpy(np.asarray(v).copy())
                    for k, v in fn(jax.tree.map(np.asarray, tree)).items()
                }
                torch.save(sd, out / f"{ref_name}{suffix}.pth")
    print(f"[export] step {state.step} adapters -> {out}")
    return out


if __name__ == "__main__":
    main(cfglib.cli_parse(ExportConfig))
