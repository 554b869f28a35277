"""fairdiff — TPU-native framework for finetuning text-to-image diffusion
models for fairness.

A ground-up JAX/Flax/Pallas/pjit re-design of the capabilities of
sail-sg/finetune-fair-diffusion (ICLR 2024): distributional-alignment
finetuning of Stable Diffusion via LoRA adapters or soft prompt prefixes,
with a frozen face-analysis guidance stack, optimal-transport dynamic
targets, and differentiable DPM-Solver++ sampling — all expressed as pure
functions over explicit parameter pytrees, sharded with `jax.sharding`
over a TPU device mesh.

Package map (see README.md):
  parallel/   device mesh, shardings, collective helpers
  models/     Flax modules: CLIP text/vision, SD UNet, VAE, DINOv2,
              MobileNetV3 heads, SFNet/IResNet face embedders, face detector
  ops/        Pallas TPU kernels (flash attention, fused norms)
  sampling/   DPM-Solver++ multistep (scan-based), differentiable variant
  adapters/   LoRA, soft prompt prefix, EMA
  guidance/   face detection/alignment/attribute stack, feature search
  fairness/   dynamic targets (rank/binomial, sampled & enumerated OT),
              uncertainty gates, dynamic weights, face-region grad masks
  training/   4-phase train step, optimizer, checkpointing, eval loop
  io/         torch-checkpoint -> Flax weight conversion, prompts, images
  tools/      gen_images / eval_images / export_checkpoint CLIs
  utils/      config system, RNG plumbing, grids, metrics logging
"""

__version__ = "0.1.0"
