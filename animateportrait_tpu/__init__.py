"""animateportrait_tpu: a TPU-native (JAX/XLA/Pallas/pjit) talking-portrait framework.

From-scratch re-design of the capabilities of AnimatePortrait (SIGGRAPH 2022,
"Animating Portrait Line Drawings from a Single Face Photo and a Speech
Signal"): one face photo + one speech WAV -> artistic talking-portrait video
(line-drawing or cartoon style), plus training of the underlying
geometry-conditioned style GAN.

Subpackages
-----------
- ``ops``       jittable numerical building blocks (warps, TPS splines, STFT/mel,
                masked NMS, savgol, ICP, landmark geometry)
- ``models``    Flax model definitions (MTCNN cascade, AutoVC, audio->landmark
                nets, trident GAN generators, discriminators, frozen perception
                nets)
- ``parallel``  mesh/sharding helpers for SPMD data-parallel training
- ``data``      host-side dataset pipelines
- ``train``     jitted train steps, losses, schedules
- ``io``        checkpointing and torch->JAX weight converters
- ``utils``     small host utilities
"""

__version__ = "0.1.0"
