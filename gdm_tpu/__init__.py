"""gdm_tpu — TPU-native geometric-aware dense matching for 6D pose estimation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
CUDA/torch codebase ``Ray0089/geometric-aware-dense-matching`` (Pattern
Recognition 2023): RGB-D crops -> FFB6D-style dual-branch descriptors,
SplineCNN mesh descriptors, dense cosine-similarity matching, and on-device
Kabsch/RANSAC pose recovery.

Layer map (mirrors SURVEY.md section 1, re-architected TPU-first):

    ops/       device kernels (KNN, backprojection, normals, depth fill,
               Kabsch/RANSAC, meanshift, point ops, spline-conv basis)
    models/    flax modules (ResNet/PSPNet, RandLA, FFB6D fusion, SplineCNN
               mesh encoder, DGCNN variant, GeoMatch top level)
    losses/    focal / circle (masked LSE) / auto-weighted multitask
    data/      BOP dataset readers + host-side GT generation; everything
               per-step moves on device (the KNN pyramid is built inside jit)
    train/     train state, jitted sharded train step, schedules, checkpoints
    eval/      jitted inference + pose fitting, ADD(-S) metrics, BOP CSV
    parallel/  mesh/sharding helpers (data parallelism over `data` axis)
    configs/   typed configs mirroring the reference lmo/lmfull/ycbv knobs
    refdata/   dataset metadata (ids, diameters, cameras, models_info)
    native/    host-side C++ (KD-tree KNN, voxel subsampling, depth normals)
"""

__version__ = "0.1.0"
