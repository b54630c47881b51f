"""chore_tpu: a TPU-native (JAX/XLA/Pallas) framework for joint human+object
3D reconstruction from a single RGB image, with the capabilities of CHORE
(ECCV 2022).

Layer map (mirrors SURVEY.md section 1, rebuilt TPU-first):
  ops/        pure math kernels: camera, pixel-aligned feature sampling,
              SO(3), Procrustes, chamfer, point-mesh distance, soft rasterizer
  smpl/       SMPL-H body model: chumpy-free loading, scan-based LBS, priors,
              landmark regressors, split-parameter views
  models/     the CHORE field network (stacked hourglass encoder + 4 point
              decoder heads) as flax modules
  data/       host-side data pipeline (numpy/cv2) + device feeding
  train/      pjit data-parallel trainer, optax schedules, checkpointing
  recon/      neural-field surface sampler + multi-phase SMPL/object fitting
  behave/     BEHAVE dataset on-disk readers
  preprocess/ boundary sampling GT generation (UDFs, parts, PCA axes)
  parallel/   device mesh + sharding helpers (replaces torch DDP/NCCL)
  utils/      mesh IO, rendering overlays, marching cubes
"""

__version__ = "0.1.0"
