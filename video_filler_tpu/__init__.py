"""video_filler_tpu — a TPU-native (JAX/XLA/Pallas) video-inpainting framework.

A from-scratch rebuild of the capabilities of the Torch7 ``MKimiSH/video-filler``
context-encoder stack (reference: /root/reference), redesigned TPU-first:

* all compute paths are pure functions under ``jax.jit`` (NHWC layout, bf16 MXU),
* the two-optimizer GAN step is a single fused XLA program,
* preprocessing (crop/flip/normalize/mask synthesis) runs on-device, fused into
  the train step, fed by a host-side threaded decode pipeline,
* parallelism is a ``jax.sharding.Mesh`` (data/model axes) with XLA collectives
  over ICI — not a port of any single-GPU code path.

Layer map (bottom to top) mirrors SURVEY.md §1:
  ops/        conv, transposed conv, batchnorm, losses, mask synthesis, image ops
  models/     context-encoder generator / discriminator zoo (all reference variants)
  train/      fused GAN train step + epoch driver
  parallel/   mesh construction + sharding rules (DP over ICI, optional TP)
  data/       dataset index, host decode, threaded prefetch, 4 sample regimes
  checkpoint/ pytree checkpoint incl. optimizer state, step and RNG
  eval/       demo / patch-test / video / tiled whole-image inference
"""

__version__ = "0.1.0"
