"""EgoScaler-TPU: a TPU-native (JAX/XLA/Pallas/pjit) rebuild of EgoScaler.

Generating 6DoF object-manipulation trajectories from action descriptions
in egocentric vision — dataset-construction pipeline + multimodal
trajectory-generation model (PointLLM with RT-2 trajectory tokens),
re-designed TPU-first from the reference sk4161/EgoScaler.

Layers (bottom-up):
  configs/       typed config tree
  geometry/      pure-JAX geometry core (camera, SE3, Kabsch, OBB, traj)
  registration/  voxel/FPFH/RANSAC/ICP ego-motion cancellation stack
  ops/           Pallas kernels + XLA ops (flash attention, FPS, kNN, ...)
  models/        PointBERT, LLaMA, PointLLM fusion, traj tokenizer
  parallel/      mesh + sharding rules (pjit, data/model axes)
  training/      jitted train/eval harness, metrics, checkpointing
  pipelines/     data-construction stages (candidate -> 6DoF trajectory)
  data/          corpus adapters, HOT3D eval providers, NLP tools
  vis/           trajectory visualization
"""

__version__ = "0.1.0"
