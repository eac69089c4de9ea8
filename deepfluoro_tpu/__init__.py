"""DeepFluoro-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for automatic
annotation of hip anatomy in fluoroscopy.

Re-implements the full capability surface of rg2/DeepFluoroLabeling-IPCAI2020
(see /root/reference and SURVEY.md) with a TPU-first architecture:

- ``ops``      : pure-functional numeric kernels (soft Dice, 2D NCC, Gaussian
                 heatmap synthesis, center-crop/padding math) — all jittable.
- ``models``   : the joint segmentation + landmark-heatmap U-Net as a Flax
                 module (NHWC layout, MXU-friendly convs, optional bfloat16).
- ``data``     : HDF5 schema readers/writers, device-side augmentation
                 pipeline (stateless PRNG, fixed shapes), synthetic fixtures.
- ``train``    : jitted train/eval steps, optax optimizers, warm-restart
                 cosine + plateau LR schedules, self-describing single-file
                 checkpoints with atomic writes and full resume.
- ``infer``    : ensemble inference as one compiled program (vmapped over
                 stacked checkpoints), HDF5 ``nn-segs``/``nn-heats`` output.
- ``eval``     : landmark extraction ("rule 3"), hard-Dice CSV computation.
- ``viz``      : annotation/heatmap overlay rendering.
- ``parallel`` : device mesh construction, batch/ensemble/spatial sharding
                 with halo exchange for large-resolution frames.

Internal array layout convention is NHWC (TPU-native): projections are
``(B, H, W, 1)``, one-hot segmentations ``(B, H, W, num_classes)``, heatmaps
``(B, H, W, num_lands)``. HDF5 files keep the reference's (N, R, C) /
(N, L, R, C) layouts; conversion happens at the I/O boundary.
"""

__version__ = "0.1.0"
