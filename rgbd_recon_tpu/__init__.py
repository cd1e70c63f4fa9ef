"""rgbd_recon_tpu — TPU-native multi-Kinect free-viewpoint 3D reconstruction.

A brand-new JAX / XLA / Pallas framework with the capabilities of the reference
C++/OpenGL application ``0x0AF/rgbd-recon`` (see SURVEY.md): stream ingest of
calibrated Kinect-v2 RGBD sensor frames, fused per-pixel preprocessing
(morphological filtering, bilateral depth filtering, boundary/silhouette
refinement, normals, quality weights), calibration-volume warping, brick-sparse
TSDF fusion, and a space-skipping raymarching renderer with multi-view color
blending and hole filling — all expressed as pure functions over named arrays,
jitted and sharded with ``jax.sharding`` for multi-chip meshes.

Layout (mirrors SURVEY.md §7):
  ops/          pure compute kernels (JAX reference paths + Pallas fast paths)
  calibration/  sensor model: calib file/volume I/O, frustums, inverse bake
  io/           CLI/config parsing, .stream replay, ZMQ ingest, host feeding
  models/       reconstruction strategies (points, integration, trigrid, mvt)
  parallel/     device-mesh sharding of the TSDF volume / frame batches
  utils/        math helpers, timer database, camera navigation
  runtime/      frame pipeline orchestration + the kinect_client equivalent
"""

__version__ = "0.1.0"
