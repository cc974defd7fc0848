"""roar_tpu — a TPU-native (JAX/XLA/Pallas/pjit) Indic TTS framework.

A ground-up rebuild of the capability surface of AshwinSankar17/Roar
(a NeMo-derived PyTorch Indic-TTS stack) designed TPU-first:

- ``roar_tpu.ops``      — DSP + alignment kernels (STFT/mel, pYIN, MAS,
                          forward-sum, length regulation) as jittable JAX ops.
- ``roar_tpu.models``   — flax.linen model zoo (FastPitch, HiFi-GAN, JETS, ...).
- ``roar_tpu.losses``   — loss functions.
- ``roar_tpu.data``     — manifest-driven datasets, tokenizers, featurizers,
                          static-shape bucketing for jit.
- ``roar_tpu.parallel`` — device-mesh / sharding helpers (pjit-first DP + TP).
- ``roar_tpu.training`` — train loops, optimizers/schedulers, checkpointing,
                          EMA, experiment management.
- ``roar_tpu.config``   — YAML config system with ``_target_`` instantiation.
"""

__version__ = "0.1.0"
